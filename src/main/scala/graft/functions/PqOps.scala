package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused product-quantization scoring kernels (the FloatVecDot
  * precedent applied to AnnPq): the first-written SDC/ADC scorers
  * were `aggregate(sequence(0, m−1), …)` folds of element_at lookups
  * — higher-order functions evaluate INTERPRETED per candidate, and
  * at m=32 the per-pair lambda machinery cost more than the fused
  * 64-float dot the PQ filter exists to avoid (RunQ r12:
  * q_llm_embed_neardup_pq ~36 s warm at sf0.1 interpreted). These
  * kernels run the same fold as a tight generated loop: unpack the
  * byte codes with shifts, index the broadcast table, accumulate in
  * double IN THE SAME j-ascending order — bit-identical results, so
  * AnnPqSpec's floors and the _pq_gate verdicts are unchanged.
  *
  * Layout contract (shared with AnnPq.encodeWith/sdcFlat/adcFlat):
  * packed codes = ⌈m/8⌉ longs, code j at bits [8·(j mod 8), …+8) of
  * word (j div 8); SDC table t[j·ksub² + a·ksub + b]; ADC lut
  * t[j·ksub + c]. m derives from the packed array itself (words·8),
  * never a constructor constant — only `ksub` is baked in.
  */
case class PqSdcDot(table: Expression, pa: Expression, pb: Expression,
    ksub: Int) extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = table
  override def second: Expression = pa
  override def third: Expression = pb

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"pq_sdc_dot_$ksub"

  override protected def nullSafeEval(t: Any, a: Any, b: Any): Any = {
    val tbl = t.asInstanceOf[ArrayData]
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val words = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var w = 0
    while (w < words) {
      val wa = x.getLong(w)
      val wb = y.getLong(w)
      var s = 0
      while (s < 8) {
        val ca = ((wa >>> (8 * s)) & 255L).toInt
        val cb = ((wb >>> (8 * s)) & 255L).toInt
        acc += tbl.getDouble((w * 8 + s) * ksub * ksub + ca * ksub + cb)
        s += 1
      }
      w += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b) => {
      val words = ctx.freshName("words")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val wa = ctx.freshName("wa")
      val wb = ctx.freshName("wb")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      val acc = ctx.freshName("acc")
      s"""
         |int $words = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $w = 0; $w < $words; $w++) {
         |  long $wa = $a.getLong($w);
         |  long $wb = $b.getLong($w);
         |  for (int $s = 0; $s < 8; $s++) {
         |    int $ca = (int) (($wa >>> (8 * $s)) & 255L);
         |    int $cb = (int) (($wb >>> (8 * $s)) & 255L);
         |    $acc += $t.getDouble(($w * 8 + $s) * $ksub * $ksub + $ca * $ksub + $cb);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqSdcDot =
    copy(table = newFirst, pa = newSecond, pb = newThird)
}

/** ADC sibling: full-precision-query lookup table vs one packed-code
  * column. Same layout contract and fold order as [[PqSdcDot]]. */
case class PqAdcDot(table: Expression, pa: Expression, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def left: Expression = table
  override def right: Expression = pa

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"pq_adc_dot_$ksub"

  override protected def nullSafeEval(t: Any, a: Any): Any = {
    val tbl = t.asInstanceOf[ArrayData]
    val x = a.asInstanceOf[ArrayData]
    val words = x.numElements()
    var acc = 0.0
    var w = 0
    while (w < words) {
      val wa = x.getLong(w)
      var s = 0
      while (s < 8) {
        val c = ((wa >>> (8 * s)) & 255L).toInt
        acc += tbl.getDouble((w * 8 + s) * ksub + c)
        s += 1
      }
      w += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => {
      val words = ctx.freshName("words")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val wa = ctx.freshName("wa")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $words = $a.numElements();
         |double $acc = 0.0;
         |for (int $w = 0; $w < $words; $w++) {
         |  long $wa = $a.getLong($w);
         |  for (int $s = 0; $s < 8; $s++) {
         |    int $c = (int) (($wa >>> (8 * $s)) & 255L);
         |    $acc += $t.getDouble(($w * 8 + $s) * $ksub + $c);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(table = newLeft, pa = newRight)
}

object PqOps {
  // Byte-code layout assumption (ADVICE r12): both kernels read the
  // packed-code array as longs and derive m = words*8 — one byte code
  // per subspace, 8 per long, ksub <= 256. A non-multiple-of-8 m would
  // make the last long's padding bytes decode as code 0 for subspaces
  // >= m and index tflat past its logical end (UnsafeArrayData.getDouble
  // is unchecked — silent garbage, not an error). AnnPq.requireCodeLayout
  // guards every public entry that reaches these kernels.

  /** Idempotently register the kernels (ksub baked into the function
    * name — same pattern as LshSignatures). */
  def register(spark: SparkSession, ksub: Int): Unit = {
    KernelRegistry.ensure(spark, s"pq_sdc_dot_$ksub")(
      exprs => PqSdcDot(exprs(0), exprs(1), exprs(2), ksub))
    KernelRegistry.ensure(spark, s"pq_adc_dot_$ksub")(
      exprs => PqAdcDot(exprs(0), exprs(1), ksub))
  }

  /** SDC approximate dot of two packed-code columns against the
    * broadcast flat table column. */
  def sdcDot(spark: SparkSession, table: Column, pa: Column, pb: Column,
      ksub: Int): Column = {
    register(spark, ksub)
    call_function(s"pq_sdc_dot_$ksub", table, pa, pb)
  }

  /** ADC approximate dot of a packed-code column against one query's
    * broadcast lookup-table column. */
  def adcDot(spark: SparkSession, table: Column, pa: Column,
      ksub: Int): Column = {
    register(spark, ksub)
    call_function(s"pq_adc_dot_$ksub", table, pa)
  }
}

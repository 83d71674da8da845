package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Fused sign-random-projection LSH signatures (VERDICT r1 item 8: the
  * unrolled Column formulation built a ~6k-node expression tree at 64
  * dims — analysis cost alone bites as dims grow; this is one kernel
  * call per row).
  *
  * Contract (pinned by AnnLshSpec's equivalence test): table t's bucket
  * packs `bits` sign bits; bit b's hyperplane component for dim i is
  * +1 when xxhash64(t, b, i) is even else -1 — reproduced here by the
  * same XXH64.hashInt chain Catalyst's xxhash64 uses (seed 42, values
  * chained left to right); the projection is the same sequential
  * left-fold over dims in double. Dims come from the vector itself —
  * no hardcoded dimension (ADVICE r1: the 64 literal silently nulled
  * projections for any other dim).
  */
object LshOps {
  def signatures(arr: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dims = arr.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var proj = 0.0
        var i = 0
        while (i < dims) {
          var h = XXH64.hashInt(t, 42L)
          h = XXH64.hashInt(b, h)
          h = XXH64.hashInt(i, h)
          val sign = if ((h & 1L) == 0L) 1.0 else -1.0
          proj += arr.getFloat(i).toDouble * sign
          i += 1
        }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** array<float> → array<long> of length `tables`: per-table LSH bucket
  * ids (see [[LshOps]]). */
case class LshSignatures(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signatures"

  override protected def nullSafeEval(input: Any): Any =
    LshOps.signatures(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshOps.signatures($c, $tables, $bits);")

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object LshSignatures {
  def register(spark: SparkSession, tables: Int, bits: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"lsh_signatures_${tables}_$bits",
      exprs => LshSignatures(exprs.head, tables, bits), "built-in")

  def of(spark: SparkSession, v: Column, tables: Int, bits: Int): Column = {
    register(spark, tables, bits)
    call_function(s"lsh_signatures_${tables}_$bits", v)
  }
}

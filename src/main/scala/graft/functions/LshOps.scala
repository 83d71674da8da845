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
  /** Hyperplane sign matrix for a (tables, bits, dims) config,
    * memoized per JVM (r11 bench fix: the signs depend only on
    * (t, b, i), but the kernel re-derived them through the 3-chained
    * XXH64 per component PER ROW — 38,400 hash invocations per vector
    * at 40×5×64, ~2.6 s for 2,000 rows. The cached matrix is the SAME
    * values from the SAME hash chain, so signatures are bit-identical;
    * ~100 KB per config, keyed by dims so mixed-width columns stay
    * correct). Layout: ((t · bits) + b) · dims + i. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signs(tables: Int, bits: Int, dims: Int): Array[Double] =
    signCache.computeIfAbsent((tables, bits, dims), { _ =>
      val s = new Array[Double](tables * bits * dims)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < bits) {
          var i = 0
          while (i < dims) {
            var h = XXH64.hashInt(t, 42L)
            h = XXH64.hashInt(b, h)
            h = XXH64.hashInt(i, h)
            s(((t * bits) + b) * dims + i) = if ((h & 1L) == 0L) 1.0 else -1.0
            i += 1
          }
          b += 1
        }
        t += 1
      }
      s
    })

  def signatures(arr: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dims = arr.numElements()
    val sg = signs(tables, bits, dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = ((t * bits) + b) * dims
        var proj = 0.0
        var i = 0
        while (i < dims) {
          proj += arr.getFloat(i).toDouble * sg(base + i)
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
    KernelRegistry.ensure(spark, s"lsh_signatures_${tables}_$bits")(
      exprs => LshSignatures(exprs.head, tables, bits))

  def of(spark: SparkSession, v: Column, tables: Int, bits: Int): Column = {
    register(spark, tables, bits)
    call_function(s"lsh_signatures_${tables}_$bits", v)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt => sqrtc}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Fused float-vector kernels (SURVEY §7.3: "fused cosine-similarity
  * Expression (codegen)" — promoted on BENCH evidence: the interpreted
  * `aggregate(zip_with(...))` cosine made the all-pairs near-dup query
  * ~110 s of a 172 s bench run at sf0.1).
  *
  * The generated code is a tight loop over the two ArrayData buffers —
  * no intermediate array allocation per row, stays inside whole-stage
  * codegen. Accumulation is a sequential left-fold in element order in
  * DOUBLE, bit-identical to the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * composition it replaces, so DuckDB-oracle agreement is unchanged.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (return type inferred — AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** array<double> sibling of [[FloatVecDot]] — same sequential
  * left-fold in element order, same bit-identity to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` composition it
  * replaces. Exists for the paths whose vectors are already DOUBLE
  * arrays (k-means centroids, decimal-exact means reassembled into
  * arrays): the r11 k-means assignment — the corpus-wide n·k-dot
  * apply pass at 100 TB — stays inside whole-stage codegen instead
  * of the interpreted higher-order-function fold. */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  /** Idempotently register the kernels on the session's function
    * registry, then address them via `call_function` (the stable
    * Column-construction path in Spark 4). */
  def register(spark: SparkSession): Unit = {
    KernelRegistry.ensure(spark, "float_vec_dot")(
      exprs => FloatVecDot(exprs(0), exprs(1)))
    KernelRegistry.ensure(spark, "double_vec_dot")(
      exprs => DoubleVecDot(exprs(0), exprs(1)))
  }

  /** dot(a, b) over two array<float> columns, in double. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("float_vec_dot", a, b)
  }

  /** L2 norm of an array<float> column. */
  def norm(spark: SparkSession, a: Column): Column = sqrtc(dot(spark, a, a))

  /** dot(a, b) over two array<double> columns. */
  def ddot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("double_vec_dot", a, b)
  }

  /** L2 norm of an array<double> column. */
  def dnorm(spark: SparkSession, a: Column): Column = sqrtc(ddot(spark, a, a))
}

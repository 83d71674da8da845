package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DoubleVecDot, FloatVecDot, LshSignatures, MinHashSig, SimHash32, TriShingles}

/** Library-grade session integration: register the fused kernels as
  * SQL-addressable functions via the standard extensions hook —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * after which `SELECT tri_shingles(text) ...` works from any SQL
  * surface (spark-sql, JDBC/Thrift, notebooks) with no Scala imports.
  * The in-code path (`TextKernels.triShingles(spark, col)` etc.)
  * registers the same expressions idempotently per session and remains
  * the zero-config route for library users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("tri_shingles"),
      info("tri_shingles", "_FUNC_(text) - distinct word trigrams of a space-tokenized string"),
      exprs => TriShingles(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "_FUNC_(shingles) - 16 md5-derived MinHash values of a string set"),
      exprs => MinHashSig(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "_FUNC_(set) - 32-bit SimHash of a string set"),
      exprs => SimHash32(exprs.head)))
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "_FUNC_(a, b) - dot product of two float arrays, in double"),
      exprs => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("double_vec_dot"),
      info("double_vec_dot", "_FUNC_(a, b) - dot product of two double arrays"),
      exprs => DoubleVecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("lsh_signatures"),
      info("lsh_signatures",
        "_FUNC_(vec, tables, bits) - per-table sign-LSH bucket ids (tables/bits must be int literals)"),
      exprs => LshSignatures(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
  }
}

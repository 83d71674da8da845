package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel bodies for the text expressions below. Both the
  * interpreted eval and the generated code call these static methods
  * (Scala emits static forwarders), so there is exactly one
  * implementation to keep bit-identical to the DuckDB twins, and the
  * surrounding stage stays inside whole-stage codegen (the r1 verdict
  * flagged the CodegenFallback versions for breaking every stage the
  * shingling fed — 4+ queries).
  *
  * The MD5 instance is hoisted to a ThreadLocal — `getInstance` per row
  * (r1 MinHashSig) was measurable allocation+lookup churn.
  */
object TextKernelOps {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private val suffixes: Array[Array[Byte]] =
    Array.tabulate(4)(j => ("#" + j).getBytes("UTF-8"))

  /** Distinct word trigrams of the single-space tokenization, in first-
    * appearance order (set semantics — no downstream op observes order). */
  def triShingles(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - 3) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Σ over 8-bit lanes of min(a_lane, b_lane) — the packed
    * bucket-count bound kernel (see PackedMinSum). Missing trailing
    * words count as zero on both sides. */
  def packedMinSum(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var w = 0; var s = 0L
    while (w < n) {
      val x = a.getLong(w); val y = b.getLong(w)
      var lane = 0
      while (lane < 8) {
        val xa = (x >>> (lane * 8)) & 255L
        val yb = (y >>> (lane * 8)) & 255L
        s += math.min(xa, yb)
        lane += 1
      }
      w += 1
    }
    s
  }

  /** Merge-scan |a ∩ b| over two sorted distinct UTF8String arrays
    * (see the SortedIntersectCount expression doc for the contract). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** 32-bit SimHash of a string set: bit b is set when the ±1 vote sum
    * over elements of bit b of h32(x) is positive, where h32(x) = the
    * unsigned 32-bit big-endian first word of md5(x + "#0") — exactly
    * the repo's portable h32(x, salt=0), so the DuckDB twin reproduces
    * it digit-for-digit. Vote sums are order-independent integers →
    * deterministic under any partitioning. */
  def simHash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    val md = md5.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.update(suffixes(0))
      val digest = md.digest()
      val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      var b = 0
      while (b < 32) {
        counts(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 16 MinHash values: slot s = min over shingles of the (s%4)-th
    * unsigned 32-bit big-endian word of md5(sh + "#" + s/4). The UTF-8
    * bytes come straight off the UTF8String (no toString round-trip) —
    * identical bytes, since UTF8String stores UTF-8. */
  def minhashSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill[Long](16)(Long.MaxValue)
    val md = md5.get()
    var i = 0
    while (i < n) {
      val shBytes = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < 4) {
        md.reset()
        md.update(shBytes)
        md.update(suffixes(j))
        val digest = md.digest()
        var k = 0
        while (k < 4) {
          val v = ((digest(4 * k) & 0xffL) << 24) |
            ((digest(4 * k + 1) & 0xffL) << 16) |
            ((digest(4 * k + 2) & 0xffL) << 8) |
            (digest(4 * k + 3) & 0xffL)
          val slot = 4 * j + k
          if (v < mins(slot)) mins(slot) = v
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused text kernels for the dedup pipeline (SURVEY §7.3 ladder,
  * promoted on BENCH evidence: the interpreted HOF composition
  * `array_distinct(transform(sequence(...), element_at(...)))` cost
  * ~5 s per evaluation over 5k docs at sf0.1, and the 16-way
  * `array_min(transform(shingles, md5...))` signature stack another
  * ~7 s; one pass of flat Java per row replaces both).
  *
  * Semantics stay oracle-reproducible: shingles are the distinct word
  * trigrams of the single-space tokenization (set semantics — no
  * downstream op observes order), and minhash values are unsigned
  * 32-bit big-endian slices of md5(shingle + "#" + j), j = slot/4,
  * slice = slot%4 — spelled identically in the DuckDB twin via
  * `('0x' || substr(md5(sh || '#j'), 1+8k, 8))::BIGINT`.
  */
/** |a ∩ b| of two SORTED distinct string arrays via one merge scan —
  * the allocation-free form of size(array_intersect(a, b)) for the
  * trigram pair pipeline's hot-credit stage (r15, VERDICT r14 item 7):
  * array_intersect builds a hash set AND materializes the intersection
  * array per call, only for size() to throw both away; at x100 that
  * runs 64M times over ~14-element arrays. Caller contract: both
  * inputs sorted ascending in UTF8String binary order (sort_array /
  * DuckDB list_sort — the hotPerDoc construction) and element-distinct
  * (they come from per-doc DISTINCT shingle sets); under that contract
  * the merge count equals size(array_intersect) exactly, which
  * KernelSpec pins against the HOF spelling. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernelOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernelOps.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Σ_lane min(a, b) over two packed 8-bit-lane count vectors (8 lanes
  * per long) — the hot-bucket UPPER BOUND on |hot_a ∩ hot_b| the
  * trigram pair pipeline prunes with (r15): every common hot shingle
  * lands in the same md5 bucket on both sides, so per bucket the
  * common count ≤ min of the two counts, and Σ min bounds the whole
  * intersection from above — one-sided by construction, so the prune
  * can never drop a pair that any downstream threshold would keep.
  * With 64 buckets over ~15-element sets the slack is ~2 (collision
  * term ≈ |A|·|B|/B), vs min(|A|,|B|) ≈ 15 for the scalar-count
  * bound — tight enough that only near-threshold pairs survive to the
  * expensive string-array joins. */
case class PackedMinSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_min_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernelOps.packedMinSum(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernelOps.packedMinSum($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PackedMinSum =
    copy(left = newLeft, right = newRight)
}

case class TriShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tri_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelOps.triShingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernelOps.triShingles($c);")

  override protected def withNewChildInternal(newChild: Expression): TriShingles =
    copy(child = newChild)
}

/** 32-bit SimHash of a string-set column (see TextKernelOps.simHash32). */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelOps.simHash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernelOps.simHash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** 16 MinHash values of a shingle set: slot s = min over shingles of
  * the (s%4)-th unsigned 32-bit big-endian word of md5(sh + "#" + s/4). */
case class MinHashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelOps.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernelOps.minhashSig($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object TextKernels {
  def register(spark: SparkSession): Unit = {
    KernelRegistry.ensure(spark, "tri_shingles")(
      exprs => TriShingles(exprs.head))
    KernelRegistry.ensure(spark, "minhash_sig")(
      exprs => MinHashSig(exprs.head))
    KernelRegistry.ensure(spark, "simhash32")(
      exprs => SimHash32(exprs.head))
    KernelRegistry.ensure(spark, "sorted_intersect_count")(
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    KernelRegistry.ensure(spark, "packed_min_sum")(
      exprs => PackedMinSum(exprs(0), exprs(1)))
  }

  def packedMinSum(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("packed_min_sum", a, b)
  }

  def sortedIntersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_count", a, b)
  }

  def simHash32(spark: SparkSession, set: Column): Column = {
    register(spark)
    call_function("simhash32", set)
  }

  def triShingles(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("tri_shingles", text)
  }

  def minhashSig(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("minhash_sig", shingles)
  }
}

package graft

import java.security.MessageDigest

import graft.functions.{TextKernels, VecOps}
import graft.queries.Llm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** The fused kernels must agree exactly with the built-in compositions
  * they replaced (same fold order, same hashes) — this is what keeps
  * the DuckDB oracle valid after the optimization. */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("FloatVecDot == aggregate(zip_with(_*_)) left fold, bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(200)
    def hofDot = {
      def d(c: org.apache.spark.sql.Column) = transform(c, x => x.cast(DoubleType))
      aggregate(zip_with(d($"embedding"), d(reverse($"embedding")), (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v)
    }
    val rows = e.select(
      VecOps.dot(spark, $"embedding", reverse($"embedding")).as("kernel"),
      hofDot.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("DoubleVecDot == aggregate(zip_with(_*_)) left fold, bit-for-bit") {
    // the double-array sibling (k-means centroid paths): same fold,
    // same bit-identity contract as FloatVecDot above
    val e = Tables.embeddings(spark, sf).limit(200)
      .select($"embedding".cast("array<double>").as("v"))
    val rows = e.select(
      VecOps.ddot(spark, $"v", reverse($"v")).as("kernel"),
      aggregate(zip_with($"v", reverse($"v"), (p, q) => p * q),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("TriShingles == array_distinct(transform(sequence...)) spelling") {
    val docs = Tables.documents(spark, sf).limit(100)
    val rows = docs.select(
      TextKernels.triShingles(spark, $"text").as("kernel"),
      Llm.shingles3($"text").as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    // the pair-pipeline shape: per-doc sorted distinct shingle arrays,
    // all unordered pairs of a 60-doc cut — covers empty/disjoint/
    // identical/subset shapes present in real data, plus synthetic edges
    val docs = Tables.documents(spark, sf).limit(60)
      .select($"doc_id", sort_array(TextKernels.triShingles(spark, $"text")).as("sh"))
    val pairs = docs.as("a").join(docs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.sh".as("x"), $"b.sh".as("y"))
    val bad = pairs.filter(
      TextKernels.sortedIntersectCount(spark, $"x", $"y") =!=
        size(array_intersect($"x", $"y")).cast("long")).count()
    assert(bad === 0L, s"$bad pairs diverge from size(array_intersect)")
    // synthetic edges: empty × nonempty, identical, strict subset
    val edge = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("b"), Seq("a", "b", "c")),
      (Seq("a", "c"), Seq("b", "d"))).toDF("x", "y")
    val got = edge.select(
      TextKernels.sortedIntersectCount(spark, $"x", $"y")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 3L, 1L, 0L))
  }

  test("TriShingles edge cases: under 3 tokens → empty; dups collapse") {
    val out = Seq("a b", "x y z x y z", "").toDF("text")
      .select(TextKernels.triShingles(spark, $"text").as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty)
    assert(out(1) == Seq("x y z", "y z x", "z x y")) // 4 raw trigrams, 1 dup collapsed
    assert(out(2).isEmpty)
  }

  test("MinHashSig slots match md5 slices computed directly") {
    val shingles = Seq("alpha beta gamma", "beta gamma delta")
    val got = Seq(Tuple1(shingles)).toDF("sh")
      .select(TextKernels.minhashSig(spark, $"sh").as("sig"))
      .collect().head.getSeq[Long](0)
    def slice(sh: String, j: Int, k: Int): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s"$sh#$j".getBytes("UTF-8"))
      ((d(4 * k) & 0xffL) << 24) | ((d(4 * k + 1) & 0xffL) << 16) |
        ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
    }
    val expected = (0 until 16).map(s => shingles.map(sh => slice(sh, s / 4, s % 4)).min)
    assert(got == expected)
  }

  test("MinHashSig matches the DuckDB-twin SQL spelling via Spark SQL") {
    // the oracle spells slot s as ('0x'||substr(md5(x||'#j'),1+8k,8))::BIGINT;
    // Spark's conv(substring(md5(...),...),16,10) is the same function
    val df = Seq("k1 k2 k3 k4 k5").toDF("text")
      .select(TextKernels.triShingles(spark, $"text").as("sh"))
      .select(TextKernels.minhashSig(spark, $"sh").as("sig"), $"sh")
    val row = df.selectExpr(
      "sig[0] as got",
      "array_min(transform(sh, x -> cast(conv(substring(md5(concat(x, '#0')), 1, 8), 16, 10) as bigint))) as want"
    ).collect().head
    assert(row.getLong(0) == row.getLong(1))
  }

  test("SimHash32 == 32-way aggregate() vote-sum composition, bit-for-bit") {
    // the r1 q_llm_simhash spelling (and still the DuckDB twin's shape)
    val toks = array_distinct(split($"text", " "))
    def bitSum(b: Int) =
      aggregate(toks, lit(0), (acc, t) =>
        acc + when(shiftrightunsigned(Llm.h32(t, 0), b) % 2 === 1, 1).otherwise(-1))
    val hof = (0 until 32).map(b =>
      when(bitSum(b) > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val rows = Tables.documents(spark, sf).limit(100)
      .select(TextKernels.simHash32(spark, toks).as("kernel"), hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("approx_count_distinct within declared rsd of exact (engine-only op)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct($"l_partkey")).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct($"l_partkey", 0.05)).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15) // 3× rsd headroom
  }

  test("percentile_approx lands between nearby exact percentiles (engine-only op)") {
    // accuracy=1000 bounds rank error at n/1000; the p45..p55 exact
    // band is ~50× that headroom at this n
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("a"),
      expr("percentile(l_extendedprice, 0.45)").as("lo"),
      expr("percentile(l_extendedprice, 0.55)").as("hi")).collect().head
    val (a, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(a >= lo && a <= hi, s"approx p50 $a outside exact [$lo, $hi]")
  }
}

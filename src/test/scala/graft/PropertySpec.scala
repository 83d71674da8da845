package graft

import graft.functions.VecOps
import graft.queries.Scalars
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY §5.2 item 4), driven through the real
  * Catalyst expressions (not Scala reimplementations). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  val latGen: Gen[Double] = Gen.choose(-89.0, 89.0)
  val lonGen: Gen[Double] = Gen.choose(-179.0, 179.0)

  test("haversine: symmetric, non-negative, bounded by half circumference") {
    check(Prop.forAll(latGen, lonGen, latGen, lonGen) { (la1, lo1, la2, lo2) =>
      val Array(d12, d21) = Seq((la1, lo1, la2, lo2), (la2, lo2, la1, lo1)).toDF("a", "b", "c", "d")
        .select(Scalars.haversineKm(col("a"), col("b"), col("c"), col("d")))
        .collect().map(_.getDouble(0))
      d12 >= 0.0 && d12 <= 20040.0 && math.abs(d12 - d21) < 1e-6
    })
  }

  test("cosine similarity ∈ [-1-ε, 1+ε] on random float vectors") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1.0f, 1.0f)).suchThat(_.exists(_ != 0f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val cs = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select((VecOps.dot(spark, $"a", $"b") /
          (VecOps.norm(spark, $"a") * VecOps.norm(spark, $"b"))).as("cs"))
        .collect().head.getDouble(0)
      cs >= -1.0000001 && cs <= 1.0000001
    })
  }

  test("ray cast == closed form on random rectangles and diamonds (horizontal edges safe)") {
    // rectangles exercise the axis-aligned/horizontal-edge path the
    // division-free spelling exists for; diamonds the oblique path.
    // Both have closed-form containment to judge against. Boundary
    // hits are measure-zero under continuous generators.
    import graft.operators.Geofence
    val coord = Gen.choose(-50.0, 50.0)
    val rGen = Gen.choose(0.5, 10.0)
    check(Prop.forAll(coord, coord, rGen, coord, coord, Gen.oneOf(true, false)) {
      (cx, cy, r, px, py, rect) =>
        val verts =
          if (rect) Seq((cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r), (cx - r, cy + r))
          else Seq((cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r))
        val expected =
          if (rect) math.abs(px - cx) < r && math.abs(py - cy) < r
          else math.abs(px - cx) + math.abs(py - cy) < r
        val vertsCol = array(verts.map { case (x, y) =>
          struct(lit(x).as("x"), lit(y).as("y")) }: _*)
        val got = Seq((py, px)).toDF("lat", "lon")
          .select((Geofence.rayCastCrossings(col("lat"), col("lon"), vertsCol) % 2 === 1).as("i"))
          .collect().head.getBoolean(0)
        got == expected
    })
  }

  test("dedup idempotence: dropDuplicates twice == once") {
    check(Prop.forAll(Gen.listOfN(60, Gen.choose(0, 10))) { xs =>
      val df = xs.toDF("x")
      val once = df.dropDuplicates("x")
      once.count() == once.dropDuplicates("x").count() &&
        once.count() == xs.distinct.size.toLong
    })
  }

  test("SimHash32: permutation-invariant (vote sums are order-independent)") {
    val setGen = Gen.nonEmptyListOf(Gen.identifier).map(_.distinct)
    check(Prop.forAll(setGen) { xs =>
      val perm = scala.util.Random.shuffle(xs)
      val Array(h1, h2) = Seq(Tuple1(xs), Tuple1(perm)).toDF("s")
        .select(graft.functions.TextKernels.simHash32(spark, $"s"))
        .collect().map(_.getLong(0))
      h1 == h2
    })
  }

  test("simhash banding is pigeonhole-exact: hamming<=3 pairs always share a band") {
    // the correctness argument behind q_llm_simhash_neardup's candidate
    // join — checked directly on random 32-bit values with <=3 flips
    val baseGen = Gen.choose(0L, 0xffffffffL)
    val flipsGen = Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, Gen.choose(0, 31)))
    check(Prop.forAll(baseGen, flipsGen) { (a, flips) =>
      val b = flips.foldLeft(a)((acc, i) => acc ^ (1L << i))
      val sharesBand = (0 until 4).exists(t => ((a >>> (8 * t)) & 255) == ((b >>> (8 * t)) & 255))
      java.lang.Long.bitCount(a ^ b) > 3 || sharesBand
    })
  }

  test("union-all count additivity") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 100)), Gen.listOf(Gen.choose(0, 100))) {
      (a, b) =>
        (a.nonEmpty && b.nonEmpty) ==> {
          val (da, db) = (a.toDF("x"), b.toDF("x"))
          da.unionByName(db).count() == a.size.toLong + b.size.toLong
        }
    })
  }

  test("salted two-phase agg == plain groupBy (bit-exact) on random data") {
    check(Prop.forAll(Gen.listOfN(200, Gen.zip(Gen.choose(0, 5), Gen.choose(-100.0, 100.0)))) { xs =>
      val df = xs.toDF("k", "v")
      val salted = graft.operators.SaltedAgg
        .sumCountByKey(df, col("k"), "k", col("v"), salts = 8,
          saltSource = Seq(col("v")))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      val plain = df.groupBy(col("k"))
        .agg(sum(graft.Determinism.dec(col("v"))).cast("double").as("sum_value"),
          count(lit(1)).as("n_rows"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      salted == plain
    })
  }

  test("lag is the inverse of lead under order reversal") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 50).map(i => (i, i * 2.0)).toDF("id", "v")
    val asc = Window.orderBy($"id".asc)
    val desc = Window.orderBy($"id".desc)
    val bad = df.select(
      lag($"v", 1).over(asc).as("lag_asc"),
      lead($"v", 1).over(desc).as("lead_desc"), $"id")
      .collect().count(r => r.get(0) != r.get(1))
    assert(bad == 0)
  }
}

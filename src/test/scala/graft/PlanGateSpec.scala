package graft

import java.nio.file.{Files, Paths}

import graft.plans.PlanGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automated plan-regression gate over ALL declared queries
  * (VERDICT r13 item 1). For every id in SparkEntry.queries the spec
  * extracts PlanGate.Facts from the built physical plan and asserts
  *   (a) no CartesianProduct anywhere,
  *   (b) any BroadcastNestedLoopJoin is allowlisted by id with its
  *       bounded build side named (PlanGate.BnljAllowlist),
  *   (c) every scan's pushable data filters and partition filters
  *       match the committed baseline exactly — a filter lifting off
  *       a scan is a red test naming the query and the lost filter,
  *   (d) shuffle and cached-relation counts match the baseline — a
  *       new exchange or an unmanaged cache is likewise red.
  *
  * The baseline (src/test/resources/plan_baseline.tsv) is regenerated
  * intentionally with
  *   GRAFT_REGEN_PLAN_BASELINE=1 sbt "testOnly graft.PlanGateSpec"
  * from THIS spec's exact session and SF, so generation and
  * verification can never drift. PLANS.md's generated coverage table
  * comes from the same PlanGate.facts pass (tools/PlanDump, sf0.1).
  *
  * Determinism: the pass starts from a clean cache state
  * (clearCache + CacheScope.drain) and walks ids in sorted order, so
  * CacheManager plan substitution — which would otherwise make a
  * query's InMemoryTableScan count depend on which OTHER suites ran
  * first — is a pure function of the pass itself. Facts come from the
  * PRE-execution (AQE-initial) plan: strategy selection, pushdown and
  * exchange placement are static; AQE only improves them at runtime.
  */
class PlanGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  private val baselinePath = Paths.get("src/test/resources/plan_baseline.tsv")
  private val regen = sys.env.contains("GRAFT_REGEN_PLAN_BASELINE")

  test("all declared plans hold their committed shape (238-query gate)") {
    spark.catalog.clearCache()
    CacheScope.drain(blocking = true)
    val ids = SparkEntry.queries.keys.toSeq.sorted
    val current = ids.map { id =>
      val f = try PlanGate.facts(SparkEntry.queries(id)(spark, sf))
        finally CacheScope.drain(blocking = true)
      id -> f
    }
    val invariant = current.flatMap { case (id, f) =>
      PlanGate.invariantViolations(id, f) }
    assert(invariant.isEmpty,
      s"generic plan invariants violated:\n${invariant.mkString("\n")}")
    if (regen) {
      Files.createDirectories(baselinePath.getParent)
      Files.writeString(baselinePath, current.map { case (id, f) =>
        PlanGate.serialize(id, f) }.mkString("", "\n", "\n"))
      info(s"baseline regenerated: $baselinePath (${current.size} ids)")
    } else {
      assert(Files.exists(baselinePath),
        s"missing $baselinePath — regenerate with GRAFT_REGEN_PLAN_BASELINE=1")
      val baseline = Files.readString(baselinePath).linesIterator
        .filter(_.nonEmpty).map(PlanGate.parseLine).toMap
      val missing = ids.filterNot(baseline.contains)
      val stale = baseline.keySet -- ids.toSet
      assert(missing.isEmpty && stale.isEmpty,
        s"baseline out of sync: missing=${missing.mkString(",")} " +
          s"stale=${stale.mkString(",")} — regenerate intentionally")
      val diffs = current.flatMap { case (id, f) =>
        PlanGate.diff(id, f, baseline(id)) }
      assert(diffs.isEmpty,
        s"plan drift vs baseline (${diffs.size} finding(s)):\n${diffs.mkString("\n")}")
    }
  }

  test("the gate goes red on a planted unpushed-filter regression") {
    // healthy spelling: the quantity predicate reaches the scan
    val healthy = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val okFacts = PlanGate.facts(healthy)
    assert(okFacts.scans.exists(_.dataFilters.exists(_.contains("l_quantity"))),
      s"healthy plan must push the filter: ${okFacts.render}")
    // planted regression: a non-deterministic projection blocks
    // pushdown, so the same predicate evaluates ABOVE the scan — the
    // classic silent full-scan regression at 100 TB. The rand column
    // must SURVIVE into the output: when it is pruned away, the
    // project becomes deterministic again and Catalyst (correctly)
    // pushes the filter after all — the plant verifies the gate, not
    // the optimizer's limits.
    val planted = Tables.lineitem(spark, sf)
      .withColumn("r", rand())
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity", "r")
    val badFacts = PlanGate.facts(planted)
    assert(!badFacts.scans.exists(_.dataFilters.exists(_.contains("l_quantity"))),
      "plant failed — filter still reached the scan")
    // and the DIFF the suite runs reports exactly that loss
    val findings = PlanGate.diff("planted", badFacts, okFacts)
    assert(findings.exists(_.contains("LOST")),
      s"gate failed to flag the lifted filter: $findings")
  }

  test("the gate goes red on a join degrading to a nested loop / cartesian") {
    // simulate the q_join_range_bucketed anti-pattern: a raw range
    // predicate with broadcast disabled plans as BNLJ or cartesian —
    // the invariant check must flag it for a non-allowlisted id
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val a = Tables.nation(spark, sf).select(col("n_nationkey"))
      val b = Tables.region(spark, sf).select(col("r_regionkey"))
      val degraded = a.join(b, col("n_nationkey") > col("r_regionkey"))
      val f = PlanGate.facts(degraded)
      assert(f.cartesian + f.bnlj > 0, s"plant failed: ${f.render}")
      val v = PlanGate.invariantViolations("q_not_allowlisted", f)
      assert(v.nonEmpty, "invariant check missed the degraded join")
    }
  }

  test("the gate goes red on a planted unpartitioned window over an unbounded relation") {
    // the WindowExec "No Partition Defined" pathology: every row of the
    // input moves to ONE partition. The library's own unpartitioned
    // windows run over bounded relations (PlanGate.UnpartWindowAllowlist
    // names each bound); a corpus-sized one like this must trip the
    // invariant for any id not consciously allowlisted.
    import org.apache.spark.sql.expressions.Window
    val planted = Tables.lineitem(spark, sf)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
    val f = PlanGate.facts(planted)
    assert(f.unpartWindows >= 1, s"plant failed: ${f.render}")
    val v = PlanGate.invariantViolations("q_not_allowlisted", f)
    assert(v.exists(_.contains("unpartitioned Window")),
      s"invariant check missed the single-partition window: $v")
    // a healthy partitioned spelling of the same rank stays clean
    val healthy = Tables.lineitem(spark, sf)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))))
    assert(PlanGate.facts(healthy).unpartWindows === 0)
  }

  test("no raw cache/persist call sites outside CacheScope (source audit)") {
    // the mechanical form of "no InMemoryRelation outside CacheScope":
    // every main-tree cache mark routes through CacheScope (query-local,
    // drained) or is an explicitly allowlisted bounded site. A new raw
    // .cache()/.persist( call fails here until it is either routed
    // through CacheScope or consciously allowlisted with its bound.
    import scala.jdk.CollectionConverters._
    val allow = Set(
      "graft/CacheScope.scala" // the registry itself
    )
    val root = Paths.get("src/main/scala")
    val hits = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      // diagnostic mains (tools/) own their session end-to-end and die
      // with it — the leak the registry prevents cannot occur there,
      // and they are not part of the gated query surface
      .filterNot(_.toString.contains("/tools/"))
      .filterNot(p => allow.exists(a => p.toString.endsWith(a)))
      .flatMap { p =>
        Files.readString(p).linesIterator.zipWithIndex.collect {
          case (line, i) if (line.contains(".cache()") ||
            line.contains(".persist(")) && !line.trim.startsWith("//") &&
            !line.trim.startsWith("*") =>
            s"$p:${i + 1}: ${line.trim}"
        }
      }.toSeq
    assert(hits.isEmpty,
      s"raw cache/persist outside CacheScope:\n${hits.mkString("\n")}")
  }
}

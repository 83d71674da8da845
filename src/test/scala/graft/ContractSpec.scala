package graft

import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — the failure classes that cost green
  * CORRECTNESS rows in round 1 must be structurally impossible to
  * reintroduce. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("oracle keys ⊆ query keys; only the documented engine-only op lacks an oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    // rows-only by design: sketch internals (HLL, quantile) are not
    // hash-stable vs DuckDB — both accuracy-GATED oracle-side since r10
    // (q_agg_approx_*_gate) and accuracy-tested in KernelSpec; the
    // ANN/PQ paths' missed-pair sets are hash-derived-config-specific
    // (recall pinned ≥ 0.95 in AnnHandoffSpec / AnnPqSpec, each with
    // its oracle-checked _gate twin; the r13 IVF retrieval's overlap
    // pinned ≥ 0.7 in TopKProbeSpec with its own _gate twin)
    assert((qs -- os) == Set("q_agg_approx_distinct", "q_agg_approx_percentile",
        "q_llm_embed_neardup_ann", "q_llm_knn_graph_ann",
        "q_llm_embed_neardup_pq", "q_llm_knn_topk_ann"),
      s"undeclared engine-only: ${qs -- os}")
  }

  test("no declared query outputs array/map-typed columns (driver harness cannot hash them)") {
    // CORRECTNESS_r01: pandas sort_values crashes on ndarray cells —
    // three queries lost their green rows to this. Array ops must end
    // in a serialized projection.
    for ((name, fn) <- SparkEntry.queries) {
      val schema = fn(spark, sf).schema
      schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[ArrayType] && !f.dataType.isInstanceOf[MapType],
          s"$name.${f.name}: ${f.dataType.simpleString}")
      }
    }
  }

  test("every declared query executes with codegen fallback DISABLED (no interpreted plans)") {
    // VERDICT r6 item 3, generalized from the AnnLsh path to the whole
    // surface: Spark silently degrades to interpreted execution when
    // generated code fails to compile (64KB method limit, Janino
    // errors) — correct results, multiplied cost at 100 TB, and
    // nothing in a normal run fails. fallback=false turns any such
    // degradation into a hard error here, so a query whose plan stops
    // compiling can never pass CI silently again.
    TestSpark.withSQLConf("spark.sql.codegen.fallback" -> "false") {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val n = fn(spark, sf).count()
        assert(n >= 0, name) // the count itself is the assertion target
      }
    }
  }

  test("bpe_iter round 1 is exactly bpe_apply (the iterated loop extends, not redefines)") {
    val iter1 = SparkEntry.queries("q_llm_bpe_iter")(spark, sf)
      .filter("step = 1").selectExpr("pair", "cnt").collect().toSeq
    val apply1 = SparkEntry.queries("q_llm_bpe_apply")(spark, sf)
      .selectExpr("pair", "cnt").collect().toSeq
    assert(iter1 == apply1,
      s"bpe_iter step-1 diverged from bpe_apply:\n$iter1\nvs\n$apply1")
  }

  test("every query ends deterministically: rerun produces identical rows") {
    // spot-check the queries with the most nondeterminism surface
    // (joins with ties, sampled estimators, CC resolution)
    for (name <- Seq("q_join_asof", "q_llm_pairwise_label_sim",
        "q_llm_dedup_clusters", "q_llm_simhash_neardup", "q_topk_pergroup")) {
      val a = SparkEntry.queries(name)(spark, sf).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf).collect().toSeq
      assert(a == b, s"$name not stable across reruns")
    }
  }
}

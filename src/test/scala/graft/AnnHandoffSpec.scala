package graft

import org.scalatest.funsuite.AnyFunSuite

/** The embed_neardup → ANN handoff contract (r9 verdict item 2):
  * the exact G²-bucket scan refuses past its pair budget, and the
  * declared ANN replacement holds ≥ 0.95 recall at the same 0.35
  * operating point on the LARGEST local corpus (sf0.1 — the scale the
  * r9 verdict named). Recall here is deterministic, not sampled: the
  * LSH hyperplanes are hash-derived, so for a fixed corpus + config
  * the missed-pair set is a constant.
  */
class AnnHandoffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact scan fail-loud pair budget: refuses past the envelope, names the handoff") {
    // within budget: no-op
    graft.queries.Llm.requireExactPairBudget(1000L)
    graft.queries.Llm.requireExactPairBudget(graft.queries.Llm.ExactPairEnvelope)
    // past budget: throws BEFORE any job starts, pointing at the ANN query
    val e = intercept[IllegalArgumentException] {
      graft.queries.Llm.requireExactPairBudget(graft.queries.Llm.ExactPairEnvelope + 1)
    }
    assert(e.getMessage.contains("q_llm_embed_neardup_ann"),
      s"guard message must name the handoff: ${e.getMessage}")
  }

  test("ANN handoff recall ≥ 0.95 vs exact pairs at sf0.1, precision 1.0 (subset)") {
    val sf01 = "/root/testdata/sf0.1"
    val exact = SparkEntry.queries("q_llm_embed_neardup")(spark, sf01)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("q_llm_embed_neardup_ann")(spark, sf01)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact rerank ⇒ every ANN pair truly clears the threshold
    assert(ann.subsetOf(exact), "ANN returned a pair the exact scan did not")
    val recall = if (exact.isEmpty) 1.0 else ann.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall (|exact|=${exact.size}, |ann|=${ann.size})")
  }
}

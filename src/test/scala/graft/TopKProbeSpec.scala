package graft

import graft.operators.AnnIvf
import graft.queries.Llm
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval auto-dispatch (r13): the third member of the exact→ANN
  * dispatch family (near-dup pairs r12, kNN graph r12, single-query
  * top-k here). Pins
  *   - the grow-cells rule's shape (cells = ⌈√n⌉, nprobe = ⌈cells/2⌉,
  *     floors 8/4),
  *   - the ≥0.7 top-10 overlap floor the q_llm_knn_topk_ann_gate
  *     verdict certifies, MEASURED at every driver SF (this is the
  *     near-uniform regime's honest floor: top-10 sits at cosine
  *     ~0.3–0.5 where cell assignment discriminates weakest),
  *   - both dispatch branches: the exact branch IS the oracle-checked
  *     q_llm_knn_cosine plan, the ANN branch IS annTopK at the auto
  *     config (envelope override, same discipline as
  *     AutoDispatchSpec).
  */
class TopKProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("grow-cells config shape: floors, √n growth, half probe") {
    assert(AnnIvf.autoTopKConfig(100L) === ((10, 5)))
    assert(AnnIvf.autoTopKConfig(500L) === ((23, 12)))
    assert(AnnIvf.autoTopKConfig(2000L) === ((45, 23)))
    assert(AnnIvf.autoTopKConfig(1000000L) === ((1000, 500)))
    // floors engage below 64 rows
    assert(AnnIvf.autoTopKConfig(10L) === ((8, 4)))
  }

  test("top-10 overlap >= 0.7 at the auto config, every driver SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$d/embeddings.parquet")
      val (cells, nprobe) = AnnIvf.autoTopKConfig(n)
      val exact = ids(Llm.exactTopK(spark, d)).toSet
      val ann = ids(Llm.annTopK(spark, d, cells, nprobe)).toSet
      val overlap = (exact & ann).size
      info(s"$sf n=$n cells=$cells nprobe=$nprobe overlap=$overlap/10")
      assert(overlap >= 7,
        s"$sf: IVF top-10 overlap $overlap/10 below the 0.7 gate floor")
    }
  }

  test("dispatch: exact branch == q_llm_knn_cosine rows; ANN branch == annTopK at the auto config") {
    val d = "/root/testdata/sf0.01"
    // inside the envelope: the auto query IS the exact plan
    val auto = Llm.topKAuto(spark, d).collect().toSeq
    val exact = Llm.exactTopK(spark, d).collect().toSeq
    assert(auto === exact)
    // envelope forced to 1: the auto query IS the ANN plan at the
    // grow-cells config (deterministic quantizer, so row-identical)
    val n = graft.sources.ParquetMeta.rowCount(spark, s"$d/embeddings.parquet")
    val (cells, nprobe) = AnnIvf.autoTopKConfig(n)
    val autoAnn = Llm.topKAuto(spark, d, envelope = 1L).collect().toSeq
    val ann = Llm.annTopK(spark, d, cells, nprobe).collect().toSeq
    assert(autoAnn === ann)
  }

  test("gate verdict row: ok_overlap true at sf0.01") {
    val row = SparkEntry.queries("q_llm_knn_topk_ann_gate")(
      spark, "/root/testdata/sf0.01").collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === 10L)
    assert(row(0).getBoolean(1), "gate must certify >= 0.7 overlap")
  }
}

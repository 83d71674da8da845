package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The frequent-shingle cap's hot-correction path is dormant on the
  * synthetic corpus (max df = 9 < 32), so it gets its own data: a
  * shingle shared by 46 docs. Pins both halves of the contract —
  * candidates get EXACT Jaccard (sub-cap count + hot-set intersection),
  * and pairs whose only shared shingles are hot are the documented,
  * deliberate miss. */
class NgramCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hot-shingle correction yields exact Jaccard; hot-only pairs are the documented miss") {
    import spark.implicits._
    val base = "a b c d e f g h i j"
    // docs 1,2: identical — share 10 sub-cap trigrams AND the hot one.
    // docs 3..44: unique filler + the hot trigram "w1 w2 w3".
    // docs 50,51: share ONLY the hot trigram (true Jaccard 0.2 — would
    //             pass the threshold with uncapped candidates).
    val docs =
      Seq((1L, s"$base w1 w2 w3"), (2L, s"$base w1 w2 w3")) ++
        (3L to 44L).map(i => (i, s"u$i v$i w1 w2 w3")) ++
        Seq((50L, "p5 q5 w1 w2 w3"), (51L, "p6 q6 w1 w2 w3"))
    val dir = Files.createTempDirectory("graft_hot").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_llm_ngram_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // (1,2) found via sub-cap candidates; jaccard must be EXACTLY 1.0 —
    // 11 shared shingles = 10 sub-cap + 1 hot via the correction term
    // (a dropped correction would report 10/12 ≈ 0.833).
    // (50,51) absent: their only shared shingle is hot.
    assert(out == Seq((1L, 2L, 1.0)))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interning potential of the per-doc hot-shingle sets (r15): if many
  * docs share one hot set (boilerplate IS shared by construction),
  * the pair pipeline can exchange a set ID instead of the string
  * array and intersect once per DISTINCT set pair. Prints, per SF:
  * docs with hot sets, distinct hot sets, avg hot set length, and the
  * doc count for scale context. */
object HotSetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    for (d <- dirs) {
      val cap = graft.queries.Llm.MaxShingleDf
      val sh = graft.Tables.documents(spark, d)
        .select($"doc_id",
          graft.queries.Llm.shingles3Pub(spark, $"text").as("shingles"))
        .filter(size($"shingles") > 0)
      val ex = sh.select($"doc_id", explode($"shingles").as("sh"))
      val dfc = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
      val hotPerDoc = ex.join(dfc.filter($"df" > cap).select($"sh"), "sh")
        .groupBy($"doc_id").agg(sort_array(collect_list($"sh")).as("hot_sh"))
        // \u0001 separator (spelled as an escape, not a raw control
        // char): shingles are space-joined token trigrams and cannot
        // contain it, so distinct sets cannot collide by concatenation
        .withColumn("set_id", md5(concat_ws("\u0001", $"hot_sh")))
      val nDocs = sh.count()
      val nHotDocs = hotPerDoc.count()
      val nSets = hotPerDoc.select($"set_id").distinct().count()
      val avgLen = hotPerDoc.agg(coalesce(avg(size($"hot_sh")), lit(0.0)))
        .head().getDouble(0)
      println(f"HOTSET $d docs=$nDocs hot_docs=$nHotDocs distinct_sets=$nSets avg_hot_len=$avgLen%.1f")
    }
    spark.stop()
  }
}

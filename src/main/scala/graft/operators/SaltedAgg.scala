package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation — the hot-key mitigation for grouped
  * aggregates at 100 TB (SURVEY §4.3). A skewed key (e.g. one device
  * producing 1% of all GPS fixes) overloads a single reducer in plain
  * groupBy; salting splits each key into `salts` sub-groups for the
  * first shuffle, then combines the partials in a second, tiny shuffle
  * keyed by the original key.
  *
  * Works for any algebraic aggregate (sum/count/min/max). The engine's
  * decimal-sum discipline makes the two-phase result bit-identical to
  * the single-phase one, so the oracle twin is the PLAIN group-by —
  * the rewrite is checked to be semantics-preserving, hash-exact.
  */
object SaltedAgg {

  /** Deterministic salt from arbitrary columns (not a RNG — stable
    * across retries and executors, which reshuffles hot keys evenly
    * as long as the salted columns vary within a key). */
  def salt(n: Int, cols: Column*): Column = pmod(hash(cols: _*), lit(n))

  /** sum(dec(valueCol)) + count per key, salted two-phase. */
  def sumCountByKey(df: DataFrame, key: Column, keyName: String,
      value: Column, salts: Int, saltSource: Seq[Column]): DataFrame = {
    import graft.Determinism.dec
    df.groupBy(key.as(keyName), salt(salts, saltSource: _*).as("_salt"))
      .agg(sum(dec(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyName))
      .agg(
        sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n_rows"))
  }
}

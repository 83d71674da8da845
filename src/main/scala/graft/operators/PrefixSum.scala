package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed prefix sum (SURVEY §2.9 — the shard-packing
  * primitive, VERDICT r3 item 7).
  *
  * The naive cumulative sum — `sum(v) over (order by id)` — moves the
  * WHOLE relation through one partition. The two-level form (r3) fixed
  * that for the per-row data but still pushed an n/fanout-row
  * bucket-totals relation through a single-partition window AND
  * force-broadcast it back: both ends break at 100 B rows (200 M-row
  * single-partition scan, multi-GB broadcast).
  *
  * This is the general fix: a RECURSIVE multi-level scan, the classic
  * parallel-prefix tree expressed in DataFrames.
  *
  *   level 0: cumsum within fanout-sized id buckets — a window
  *            PARTITIONED by floor(id/fanout), fully parallel;
  *   level k: bucket totals roll up and recurse with ids divided by
  *            fanout, until the relation is ≤ fanout rows — only THAT
  *            top relation crosses a single-partition window, so the
  *            serial scan is bounded by `fanout` ROWS AT ANY INPUT
  *            SIZE (depth grows as log_fanout(n) instead);
  *   unwind:  each level's exclusive offsets come back via an
  *            UNHINTED equi-join on the bucket id — AQE broadcasts the
  *            small levels at bench scale; at extreme scale the
  *            offsets join is a plain linear shuffle co-keyed with the
  *            data.
  *
  * Exactness does not depend on dense ids or balanced buckets: an
  * offset is the sum of ALL lower buckets' totals, whatever ids exist.
  * `idBound` only sizes the recursion depth (pass the row count or any
  * upper bound on the id; an underestimate still returns exact sums —
  * the top window just scans more than `fanout` rows).
  */
object PrefixSum {

  /** Adds `out` = inclusive prefix sum of `value` over ascending `ord`
    * (a non-negative integer id column). */
  def inclusive(df: DataFrame, ord: String, value: String, out: String,
      idBound: Long, fanout: Long = 500L): DataFrame = {
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    level(df, ord, value, out, idBound, fanout, 0)
  }

  // internal column names carry the recursion level — on the 2nd+
  // level the input's own ord column IS the previous level's bucket id
  private def level(df: DataFrame, ord: String, value: String, out: String,
      idBound: Long, fanout: Long, lvl: Int): DataFrame = {
    // the recursion maps idBound to idBound/fanout + 1, whose fixed
    // point is 2 at fanout=2 — so recurse ONLY when the bound actually
    // shrinks, else a strict size test never terminates there
    // (ADVICE r5); fanout >= 3 plans are unchanged by this guard
    val nextBound = idBound / fanout + 1
    if (idBound < fanout || nextBound >= idBound) {
      df.withColumn(out,
        sum(col(value)).over(Window.orderBy(col(ord))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    } else {
      // the pack_shards plan assertion keys on the level-0 name
      val bkt = if (lvl == 0) "_ps_bkt" else s"_ps_bkt$lvl"
      val intraC = s"_ps_intra$lvl"; val btotC = s"_ps_btot$lvl"
      val bcumC = s"_ps_bcum$lvl"; val offC = s"_ps_off$lvl"
      val withBkt = df.withColumn(bkt, floor(col(ord) / fanout.toDouble).cast("long"))
      val intra = withBkt.withColumn(intraC,
        sum(col(value)).over(Window.partitionBy(col(bkt)).orderBy(col(ord))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val totals = withBkt.groupBy(col(bkt)).agg(sum(col(value)).as(btotC))
      val offsets = level(totals, bkt, btotC, bcumC,
          nextBound, fanout, lvl + 1)
        .select(col(bkt), (col(bcumC) - col(btotC)).as(offC))
      intra.join(offsets, bkt)
        .withColumn(out, col(offC) + col(intraC))
        .drop(bkt, intraC, offC)
    }
  }
}

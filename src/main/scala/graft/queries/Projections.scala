package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 — projection / filter / codecs.
  *
  * The codec rows re-express the reference pipeline's three wire
  * formats (FIXTURES.md §B) on the driver testdata:
  *  - flatten: the producer's nested-JSON → 8 flat fields (main.go:97-110);
  *  - json encode: the Kafka-Connect `{schema,payload}` envelope build
  *    (main.go:111-125);
  *  - cdc after-image: the Debezium envelope decode taking only
  *    `payload.after.*` (main.go:203-208, 233-240);
  *  - wkt point: `POINT(lon lat)` lon-first `%f` formatting (main.go:210).
  */
object Projections {
  import Determinism._

  /** Schema of `events.props` — `{"k": <int>}`. */
  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** Debezium-shaped envelope schema: tolerate/ignore extra fields,
    * model only `payload.after` (reference main.go:233-240). */
  private val dbzSchema = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("after", StructType(Seq(
        StructField("id", StringType),
        StructField("latitude", DoubleType),
        StructField("longitude", DoubleType)))))))))

  /** The q_geo_in_polygon containment relation: (event_id, poly_id)
    * pairs where the fix lies inside the geofence polygon, via grid-cell
    * candidate generation + even-odd ray casting (see the q_geo_in_polygon
    * query doc for the full design rationale). Shared with the
    * transition-event query. */
  /** Synthetic geofence polygons over nation: irregular octagons (unit
    * octagon at fixed angles × per-vertex rational radii — no trig, so
    * both engines evaluate identical IEEE doubles; star-shaped ⇒
    * simple). Shape: (poly_id, clat, clon, rmax, verts). */
  private[graft] def fencePolys(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nv = 8
    val ux = array(Seq(1.0, 0.7, 0.0, -0.7, -1.0, -0.7, 0.0, 0.7).map(lit): _*)
    val uy = array(Seq(0.0, 0.7, 1.0, 0.7, 0.0, -0.7, -1.0, -0.7).map(lit): _*)
    Tables.nation(s, d)
      .select($"n_nationkey".cast(LongType).as("poly_id"),
        (($"n_nationkey" * 7.3) % 120.0 - 60.0).as("clat"),
        (($"n_nationkey" * 13.7) % 240.0 - 120.0).as("clon"),
        (lit(3.0) + ($"n_nationkey" % 4)).as("rmax"))
      .withColumn("verts", transform(sequence(lit(0), lit(nv - 1)), i => {
        // radius varies per vertex -> irregular but still simple
        // (star-shaped: monotone angle, positive radius <= 0.92*rmax)
        val r = $"rmax" * (lit(0.6) + lit(0.4) * ((i * 7 + $"poly_id") % 5) / lit(5.0))
        struct(($"clon" + r * element_at(ux, i + 1)).as("x"),
               ($"clat" + r * element_at(uy, i + 1)).as("y"))
      }))
  }

  /** The synthetic fix positions shared by the geo family (lat from
    * value, lon from event_id — see q_geo_nearest_poi's independence
    * note). */
  private[graft] def fixPositions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select($"event_id",
      ($"value" % 180.0 - 90.0).as("lat"),
      (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
  }

  private val FenceCellW = 6.0

  private def containmentPairs(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Geofence
    // SHARED since r19 (was rebuilt per query): q_geo_in_polygon,
    // q_geo_fence_events and q_geo_fence_dwell each re-ran the
    // cell-join + ray-cast containment pass over every fix for one
    // deterministic relation bounded by the contained-fix count
    // (output-sized); released via drainShared.
    graft.CacheScope.sharedEager(
      Geofence.containment(fixPositions(s, d),
          Geofence.polyCells(fencePolys(s, d), FenceCellW), FenceCellW)
        .select(col("event_id"), col("poly_id")))
  }

  /** Per-(bucket, cell) occupancy budget for the co-location family
    * (r10, r9 verdict item 4): exact pairwise co-location is Σ cell²
    * work, so ONE pathological cell — every device parked in the same
    * (bucket, cell) — degrades the whole job to that cell's quadratic
    * (measured in HotCellSpec: planted hot cells grow candidate work
    * exactly n²). Since r11 the refinement is AUTOMATED (r10 verdict
    * item 2): a cell whose RAW occupancy exceeds the budget is
    * pre-thinned — co-stationary fixes collapse to one deterministic
    * representative per (device, bucket, cell), which preserves the
    * ≥3-distinct-bucket convoy semantics because co-location per
    * bucket is a binary predicate per device pair — and only a cell
    * whose DISTINCT-DEVICE count exceeds the budget (irreducibly
    * quadratic: thinning cannot reduce distinct devices) fails loudly
    * with the remaining manual refinement (halve W). The guard sits on
    * a Boolean-valued when/otherwise(raise_error) path feeding the
    * pair join, so the optimizer can neither null-fold nor prune it.
    * Cells at/under the budget pass through raw — below the budget the
    * operator stays hash-exact vs the oracle (HotCellSpec pins all
    * three regimes). 10k devices in one cell ≈ 9·10⁸ pair evals across
    * its 9-cell neighborhood — about a minute of one executor core;
    * the measured sf0.1 max occupancy is 16 — 600× under the budget. */
  private[graft] val HotCellBudget = 10000L

  /** The convoy pair relation (see q_geo_convoy): device pairs
    * co-located (same 6 h bucket, within 5°) in >= 3 distinct buckets.
    * Shared by q_geo_convoy (the pair report) and q_geo_groups (CC
    * over the pair graph). `budget` is the per-cell occupancy bound
    * (tests inject a tiny one to pin the fail-loud path). */
  private def convoyPairs(s: SparkSession, d: String): DataFrame =
    // output-sized shared cache (r18 optimization, the Llm family
    // precedent): q_geo_convoy and q_geo_groups both derive this exact
    // pair relation per session — the second consumer previously
    // re-ran the occupancy join + thin + 9-cell neighborhood join.
    // Deterministic (grid equi-join, no sampling), and only the
    // ≥ 3-bucket survivor PAIRS are cached (report-sized), never the
    // per-(bucket, cell) candidate volume — scale-safe wherever the
    // hot-cell budget admits the query. Multi-corpus harnesses release
    // via CacheScope.drainShared (the documented contract).
    graft.CacheScope.sharedEager(convoyPairsBudgeted(s, d, HotCellBudget))

  private[graft] def convoyPairsBudgeted(s: SparkSession, d: String,
      budget: Long): DataFrame = {
    import s.implicits._
    val B = 21600000.0; val W = 5.0
    val e = Tables.events(s, d).select($"user_id",
      floor(msEpoch($"ts") / B).cast("long").as("bk"),
      ($"value" % 180.0 - 90.0).as("lat"),
      (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
    val a0 = e
      .withColumn("ci", floor($"lat" / W)).withColumn("cj", floor($"lon" / W))
    // occupancy pass (the r10 shape): ONE partial-agg count to
    // (bk, ci, cj), joined back on the SAME key as the pair join
    // (exchange reused; AQE broadcasts the count side when small).
    val cellCounts = a0.groupBy($"bk", $"ci", $"cj").agg(count(lit(1)).as("cell_n"))
    val tagged = a0.join(cellCounts, Seq("bk", "ci", "cj"))
    val cold = tagged.filter($"cell_n" <= budget)
      .select($"user_id", $"bk", $"ci", $"cj", $"lat", $"lon")
    // automated refinement (VERDICT r10 item 2): cells past the RAW
    // budget collapse co-stationary fixes to one deterministic
    // representative per (device, bucket, cell) — min(struct(lat,
    // lon)), a total order — bounding the cell at its distinct-device
    // count. The dev_n aggregate and the irreducibility guard run
    // ONLY over hot-cell rows (normally zero — sf0.1 max occupancy is
    // 16), so the common path pays nothing for them. The guard rides
    // a Boolean-valued when/otherwise(raise_error) filter (ADVICE
    // r10: assert_true(...).isNull put the error on a NullType path a
    // future optimizer could legally null-fold away) and trips only
    // on the IRREDUCIBLE case — more DISTINCT co-located devices than
    // the budget, which thinning cannot reduce. Cells at/under the
    // budget pass through untouched, so below the budget the output
    // is bit-identical to the exact dataflow (oracle unaffected).
    val hotRows = tagged.filter($"cell_n" > budget)
    val hotDev = hotRows.groupBy($"bk", $"ci", $"cj")
      .agg(countDistinct($"user_id").as("dev_n"))
    val hot = hotRows.join(hotDev, Seq("bk", "ci", "cj"))
      .filter(when($"dev_n" <= budget, lit(true)).otherwise(raise_error(
        concat(lit("convoyPairs: hot (bucket,cell) with "), $"dev_n",
          lit(s" DISTINCT co-located devices exceeds the $budget-row " +
            "co-location budget — irreducibly quadratic cell " +
            "(pre-thinning cannot reduce distinct devices); halve the " +
            "cell width W (see HotCellBudget doc)")))))
      .groupBy($"user_id", $"bk", $"ci", $"cj")
      .agg(min(struct($"lat", $"lon")).as("r"))
      .select($"user_id", $"bk", $"ci", $"cj",
        $"r.lat".as("lat"), $"r.lon".as("lon"))
    // BOTH pair-join sides consume the thinned union, so it is cached
    // query-locally: without this the scan→occupancy-join→thin→union
    // pipeline evaluates once per side. It is fix-sized (≤ the events
    // scan), the footprint the cached shingle/pair relations already
    // budget for; at 100 TB the cache degrades to disk-backed
    // materialization, still cheaper than re-running the occupancy
    // join per side.
    // SHARED (r18): q_geo_convoy and q_geo_groups both construct this
    // relation; a query-local mark made the second consumer re-pay the
    // occupancy join + thin pipeline at CONSTRUCTION time (the eager
    // fill runs before the shared output cache can short-circuit).
    // Deterministic; released at corpus boundaries via drainShared.
    // EAGER fill: both sides of the pair join scan this union in
    // concurrent stages; a lazy fill would re-run the occupancy
    // join+thin pipeline per side (CacheScope.localEager note)
    val a = graft.CacheScope.sharedEager(cold.unionByName(hot))
    val b = a.select($"user_id".as("ub"), $"bk",
        $"lat".as("lat_b"), $"lon".as("lon_b"))
      .withColumn("ci", explode(array((-1 to 1).map(dI =>
        floor($"lat_b" / W) + dI): _*)))
      .withColumn("cj", explode(array((-1 to 1).map(dJ =>
        floor($"lon_b" / W) + dJ): _*)))
    a.join(b, Seq("bk", "ci", "cj"))
      .filter($"user_id" < $"ub" &&
        sqrt(($"lat" - $"lat_b") * ($"lat" - $"lat_b") +
             ($"lon" - $"lon_b") * ($"lon" - $"lon_b")) <= W)
      .groupBy($"user_id", $"ub")
      .agg(countDistinct($"bk").as("n_buckets"),
        min($"bk").as("first_bk"), max($"bk").as("last_bk"))
      .filter($"n_buckets" >= 3)
      .select($"user_id".as("user_a"), $"ub".as("user_b"),
        $"n_buckets", $"first_bk", $"last_bk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Nested-struct flatten with renames (timestamp→id, device_id→deviceId
    // in the reference; here events.props JSON → flat columns).
    "q_proj_flatten" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id".as("id"),
          $"user_id".as("device_id"),
          tsMs($"ts").as("ts_ms"),
          from_json($"props", propsSchema).getField("k").as("k"),
          $"value".as("speed"))
        .orderBy($"id")
    }),

    "q_proj_rename" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .select(
          $"c_custkey".as("cust_id"),
          $"c_name".as("cust_name"),
          $"c_mktsegment".as("segment"))
        .orderBy($"cust_id")
    }),

    "q_filter_basic" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 30.0 && $"l_discount" < 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
    }),

    "q_filter_in_between" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter(
          $"o_orderstatus".isin("O", "F") &&
          $"o_totalprice".between(1000.0, 200000.0) &&
          $"o_orderpriority".like("%URGENT%") &&
          $"o_custkey".isNotNull)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_orderkey")
    }),

    // JSON decode to typed struct; PERMISSIVE → corrupt rows yield null
    // (mirrors the reference's skip-on-error, main.go:205-208).
    "q_codec_json_decode" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id",
          from_json($"props", propsSchema).getField("k").as("k_int"),
          get_json_object($"props", "$.k").as("k_str"))
        .orderBy($"event_id")
    }),

    // Struct → JSON envelope build (Kafka-Connect shape, main.go:111-125).
    "q_codec_json_encode" -> ((s, d) => {
      import s.implicits._
      val schemaLit =
        """{"schema":{"type":"struct","fields":[{"type":"string","field":"id"},{"type":"string","field":"device_id"}]},"payload":"""
      Tables.events(s, d)
        .select(
          $"event_id",
          concat(
            lit(schemaLit),
            to_json(struct(
              $"event_id".cast(StringType).as("id"),
              $"event_type".as("device_id"))),
            lit("}")).as("envelope"))
        .orderBy($"event_id")
    }),

    // CDC after-image extraction: build a Debezium-shaped envelope from
    // events, decode it, take payload.after.* only.
    "q_cdc_after_image" -> ((s, d) => {
      import s.implicits._
      val dbz = concat(
        lit("""{"payload":{"before":null,"after":{"id":""""),
        $"event_id".cast(StringType),
        lit("""","latitude":"""),
        format_string("%.6f", $"value"),
        lit(""","longitude":"""),
        format_string("%.6f", $"value" * lit(2.0)),
        lit("""},"op":"c","ts_ms":"""),
        msEpoch($"ts").cast(StringType),
        lit("}}"))
      Tables.events(s, d)
        .select($"event_id", from_json(dbz, dbzSchema).as("e"))
        .select(
          $"event_id",
          $"e.payload.after.id".as("id"),
          $"e.payload.after.latitude".as("latitude"),
          $"e.payload.after.longitude".as("longitude"))
        .orderBy($"event_id")
    }),

    // SCD2 history reconstruction from the CDC event log: each event
    // opens a validity interval for its key, closed by the key's next
    // event (the query-engine view of the reference's append-only
    // location_instances history, main.go:212-223). One shuffle on the
    // key for the per-key lead() — windows stay partitioned, nothing
    // global. Event-time follows the ms-truncation discipline. (r3)
    "q_cdc_scd2" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy($"valid_from_ms", $"event_id")
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"value",
          msEpoch($"ts").as("valid_from_ms"))
        .withColumn("valid_to_ms", lead($"valid_from_ms", 1).over(w))
        .withColumn("is_current", $"valid_to_ms".isNull)
        .orderBy($"event_id")
    }),

    // Latest-state snapshot per key from the CDC event log — the
    // materialized view a CDC engine maintains. Deliberately an
    // order-independent max(struct) aggregate keyed by the unique
    // (event-time, event_id) prefix, NOT a row_number window: partial
    // aggregation combines map-side, safe under AQE, no per-key sort
    // at 100 TB. (r3)
    "q_cdc_snapshot" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id",
          struct(msEpoch($"ts").as("ms"), $"event_id", $"value", $"event_type").as("st"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"st").as("w"))
        .select($"user_id", $"n_events",
          $"w.event_id".as("last_event_id"), $"w.ms".as("last_ms"),
          $"w.value".as("last_value"), $"w.event_type".as("last_type"))
        .orderBy($"user_id")
    }),

    // CDC delete/tombstone semantics (r9, VERDICT r8 item 4): the
    // reference reads only payload.after (main.go:233-240), so a
    // Debezium delete (op='d', after=null) simply vanished from the
    // q_cdc_snapshot view. Here the op rides INSIDE the same
    // order-independent max(struct) fold — placed after the unique
    // (ms, event_id) prefix, so it never influences which event wins —
    // and a key whose LAST event is a tombstone is dropped from the
    // materialized state, exactly what a restored replica would show.
    // Tombstones are synthesized deterministically (event_id % 7 == 0
    // → op='d'; the corpus carries no op column). Delete handling
    // costs ONE filter on the already-folded row: still a single
    // partial-aggregable groupBy, no window, no second pass, safe
    // under AQE and any arrival order — which is what lets the
    // streaming twin (Pipeline.snapshotStateWithDeletes) maintain it
    // incrementally with interleaved deletes across micro-batches.
    // n_events counts ALL log events for the key, tombstones included
    // (it reports log volume, not live-row multiplicity).
    "q_cdc_snapshot_deletes" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id",
          struct(msEpoch($"ts").as("ms"), $"event_id",
            when($"event_id" % 7 === 0, lit("d")).otherwise(lit("u")).as("op"),
            $"value", $"event_type").as("st"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"st").as("w"))
        .filter($"w.op" =!= "d")
        .select($"user_id", $"n_events",
          $"w.event_id".as("last_event_id"), $"w.ms".as("last_ms"),
          $"w.value".as("last_value"), $"w.event_type".as("last_type"))
        .orderBy($"user_id")
    }),

    // Point-in-time (AS OF) snapshot (r8): reconstruct every key's
    // state as it stood at a literal wall-clock instant — the
    // time-travel query a CDC-maintained history exists to answer
    // ("what did the replica look like last Monday?"). Same
    // order-independent max(struct) fold as q_cdc_snapshot over the
    // time-bounded prefix of the log; keys born after the cut simply
    // don't exist yet, exactly as a restored-at-T replica wouldn't.
    // The cut predicate is spelled on the RAW ns-epoch column (exact:
    // floor(ns/1e6) < C  ⟺  ns < C·1e6 for integer ns), so it reaches
    // the parquet scan as a PushedFilters row-group predicate
    // (PlanSpec-pinned) — at 100 TB a time-partitioned history prunes
    // whole partitions instead of reading-then-dropping them.
    "q_cdc_asof_snapshot" -> ((s, d) => {
      import s.implicits._
      val AsOfMs = 1705276800000L // 2024-01-15T00:00:00Z
      Tables.eventsBefore(s, d, AsOfMs)
        .select($"user_id", msEpoch($"ts").as("ms"), $"event_id", $"value", $"event_type")
        .select($"user_id", struct($"ms", $"event_id", $"value", $"event_type").as("st"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"st").as("w"))
        .select($"user_id", $"n_events",
          $"w.event_id".as("last_event_id"), $"w.ms".as("last_ms"),
          $"w.value".as("last_value"), $"w.event_type".as("last_type"))
        .orderBy($"user_id")
    }),

    // Two-instant AS OF diff (r8): classify every key's evolution
    // between two wall-clock instants T1 < T2 — added (born in the
    // window), changed (new last event), same (untouched) — the audit
    // query behind "what did last week's deploy touch". ONE scan and
    // ONE groupBy: both point-in-time states come out of the same
    // aggregate as conditional max(struct) folds (w1 over the ms<T1
    // prefix via a null-gated when(), w2 over everything), so the log
    // is never read or shuffled twice and no snapshot-vs-snapshot join
    // exists. The T2 cut is spelled on the raw ns column and lands in
    // PushedFilters (the q_cdc_asof_snapshot discipline).
    "q_cdc_asof_diff" -> ((s, d) => {
      import s.implicits._
      val T1 = 1704088800000L // 2024-01-01T06:00:00Z
      val T2 = 1705276800000L // 2024-01-15T00:00:00Z
      Tables.eventsBefore(s, d, T2)
        .select($"user_id", msEpoch($"ts").as("ms"), $"event_id")
        .groupBy($"user_id")
        .agg(
          max(when($"ms" < T1, struct($"ms", $"event_id"))).as("w1"),
          max(struct($"ms", $"event_id")).as("w2"),
          count(when($"ms" >= T1, lit(1))).as("n_between"))
        .select($"user_id",
          when($"w1".isNull, lit("added"))
            .when($"w1.event_id" =!= $"w2.event_id", lit("changed"))
            .otherwise(lit("same")).as("change_type"),
          $"w1.event_id".as("event_id_t1"),
          $"w2.event_id".as("event_id_t2"),
          $"n_between")
        .orderBy($"user_id")
    }),

    // Snapshot table diff (r7): the CDC-RECONCILIATION operator —
    // classify every key across two table versions as added/removed/
    // changed/same. This is what validates a CDC-maintained replica
    // (the reference's raw→derived table pair, main.go:212-223)
    // against a fresh source snapshot. The "new version" is derived
    // deterministically: %10==3 deleted, %10==5 modified, %10==7
    // cloned as inserts. Row identity is md5 over the compared
    // columns, so the diff is ONE full-outer equi-join on the key +
    // a 4-group partial agg; with both snapshots bucketed on the key
    // (Layout.writeBucketed) the join shuffles nothing at any scale.
    "q_cdc_table_diff" -> ((s, d) => {
      import s.implicits._
      val old = Tables.documents(s, d).select($"doc_id", $"lang", $"source", $"n_chars")
      val nw = old.filter($"doc_id" % 10 =!= 3)
        .withColumn("n_chars",
          when($"doc_id" % 10 === 5, $"n_chars" + 1).otherwise($"n_chars"))
        .unionByName(old.filter($"doc_id" % 10 === 7)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"lang", $"source", $"n_chars"))
      // coalesce to a  sentinel BEFORE hashing: concat_ws skips
      // NULLs (separator too) while SQL || propagates them — a NULL
      // component would classify the row differently on the two
      // engines; the sentinel makes null semantics identical by
      // construction (oracle spells the same coalesce(chr(1)))
      def nn(c: org.apache.spark.sql.Column) =
        coalesce(c.cast("string"), lit(""))
      def rh(df: org.apache.spark.sql.DataFrame) = df.withColumn("rh",
        md5(concat_ws("|", nn($"lang"), nn($"source"), nn($"n_chars"))))
      rh(old).select($"doc_id", $"rh".as("rh_old"))
        .join(rh(nw).select($"doc_id", $"rh".as("rh_new")), Seq("doc_id"), "full")
        .withColumn("status",
          when($"rh_old".isNull, lit("added"))
            .when($"rh_new".isNull, lit("removed"))
            .when($"rh_old" =!= $"rh_new", lit("changed"))
            .otherwise(lit("same")))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("min_key"), max($"doc_id").as("max_key"))
        .orderBy($"status")
    }),

    // Spatial grid binning (r7): fixes bucketed into 0.5°×0.5° cells
    // inside a bounding box — the standard telemetry heat-map/density
    // aggregation over the reference's GPS domain, and the GRID
    // PARTITIONING that underlies scalable spatial joins (candidates
    // meet in a cell, exactly the band/bucket pattern the near-dup
    // family uses). One partial-agg shuffle on the bounded-cardinality
    // cell key; the bbox filter pushes to the scan.
    "q_geo_cell_agg" -> ((s, d) => {
      import s.implicits._
      val fixes = Tables.events(s, d).select($"event_id", $"user_id",
        ($"value" % 180.0 - 90.0).as("lat"), ($"value" % 360.0 - 180.0).as("lon"))
      fixes.filter($"lat".between(-60.0, 60.0) && $"lon".between(-120.0, 120.0))
        .groupBy(floor($"lat" / 0.5).as("cell_lat"), floor($"lon" / 0.5).as("cell_lon"))
        .agg(count(lit(1)).as("n_fixes"),
          countDistinct($"user_id").as("n_devices"),
          sumd($"lat").as("sum_lat"))
        .orderBy($"cell_lat", $"cell_lon")
    }),

    // k-ring density smoothing (r9): each grid cell's fix count
    // replaced by the uniform 3×3-neighborhood mean (missing neighbors
    // count as zero) — the denoising pass a hotspot map runs before
    // thresholding, so one cell-straddling cluster isn't split into
    // two sub-threshold halves. Scale: the corpus collapses to the
    // GRID first (one partial-agg groupBy — the q_geo_cell_agg
    // relation), then the 9-offset expansion runs over cells, not
    // fixes: a broadcast cross join with a 9-row literal and ONE more
    // partial-agg shuffle on the target cell. Never a self-join of the
    // grid, never a fix-level explode. Determinism: counts are
    // integers; the only float op is the final /9.0.
    "q_geo_cell_smooth" -> ((s, d) => {
      import s.implicits._
      val fixes = Tables.events(s, d).select(
        ($"value" % 180.0 - 90.0).as("lat"), ($"value" % 360.0 - 180.0).as("lon"))
      val g = fixes.filter($"lat".between(-60.0, 60.0) && $"lon".between(-120.0, 120.0))
        .groupBy(floor($"lat" / 0.5).as("cell_lat"), floor($"lon" / 0.5).as("cell_lon"))
        .agg(count(lit(1)).as("n"))
      val offsets = Seq(-1, 0, 1).flatMap(dx => Seq(-1, 0, 1).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      g.crossJoin(broadcast(offsets))
        .groupBy(($"cell_lat" + $"dx").as("cell_lat"),
          ($"cell_lon" + $"dy").as("cell_lon"))
        .agg(
          sum(when($"dx" === 0 && $"dy" === 0, $"n").otherwise(0L)).as("n_self"),
          sum($"n").as("ring_total"),
          round(sum($"n").cast(org.apache.spark.sql.types.DoubleType) / 9.0, 6)
            .as("smoothed"))
        .filter($"n_self" > 0)
        .orderBy($"cell_lat", $"cell_lon")
    }),

    // Bounded-radius nearest-POI spatial join (r7): each fix matched
    // to its nearest point-of-interest within R=2.0° — the geofencing/
    // enrichment query over the reference's GPS domain, in its EXACT
    // scale-safe form. Grid cells of width R make the 9-cell
    // neighborhood probe exhaustive by construction (anything within R
    // of a fix lies in the fix's cell or a neighbor), so candidates
    // come from an EQUI-join on the cell key — each (fix, poi) pair
    // meets exactly once (the fix's own cell), no BNLJ, no dedup —
    // and the winner is an order-independent min(struct(dist, id))
    // aggregate. The 2D analog of edit_distance's adjacent-bucket
    // probe; works when BOTH sides are huge. Oracle affords the plain
    // quadratic (cross join + row_number).
    "q_geo_nearest_poi" -> ((s, d) => {
      import s.implicits._
      val R = 2.0
      // lon deliberately derives from event_id, not value: lat and lon
      // from the same column would put every fix on a 1-D curve that
      // never approaches the POI lattice (measured min distance 17.8°
      // — a vacuous query); independent derivations spread fixes over
      // the 2-D box (52 matches at sf0.01).
      val fixes = Tables.events(s, d).select($"event_id",
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val poi = Tables.nation(s, d).select($"n_nationkey".as("poi_id"),
        (($"n_nationkey" * 7.3) % 120.0 - 60.0).as("lat_p"),
        (($"n_nationkey" * 13.7) % 240.0 - 120.0).as("lon_p"))
      val fCell = fixes
        .withColumn("ci", floor($"lat" / R)).withColumn("cj", floor($"lon" / R))
      val pCell = poi
        .withColumn("ci", explode(array((-1 to 1).map(dI =>
          floor($"lat_p" / R) + dI): _*)))
        .withColumn("cj", explode(array((-1 to 1).map(dJ =>
          floor($"lon_p" / R) + dJ): _*)))
      val dist = sqrt(($"lat" - $"lat_p") * ($"lat" - $"lat_p") +
        ($"lon" - $"lon_p") * ($"lon" - $"lon_p"))
      fCell.join(pCell, Seq("ci", "cj"))
        .withColumn("dist", dist)
        .filter($"dist" <= R)
        .groupBy($"event_id")
        .agg(min(struct($"dist", $"poi_id")).as("w"))
        .select($"event_id", $"w.poi_id".as("poi_id"), round($"w.dist", 6).as("dist"))
        .orderBy($"event_id")
    }),

    // Point-in-polygon geofence containment (r8): which fixes lie
    // inside which geofence polygon — the last PostGIS-delegated
    // capability of the reference (ST_GeomFromText + location_instances,
    // main.go:210-214) as a native operator. Polygons are vertex ARRAYS
    // (array<struct<x,y>>; here synthesized as irregular octagons from
    // nation — fixed angles, rational radii, NO trig so both engines
    // evaluate identical IEEE doubles) and containment is even-odd ray
    // casting: an `aggregate` lambda over the vertex array counting
    // edge crossings of the +x ray, division-free (cross-product sign
    // instead of the x-intercept quotient, so a horizontal edge never
    // divides by zero). Scale shape: polygons explode into the grid
    // cells of their bounding box (cell width W >= bbox half-width, so
    // the explode is <=9 cells/polygon), fixes bin into their one cell,
    // candidates come from an EQUI-join on the cell key — each
    // (fix, polygon) pair meets at most once, no BNLJ, no dedup — and
    // the ray cast is a narrow per-candidate map. Works when both sides
    // are huge. Oracle affords the plain bbox theta-join + an 8-row
    // edge table per polygon.
    "q_geo_in_polygon" -> ((s, d) =>
      containmentPairs(s, d).orderBy(col("event_id"), col("poly_id"))),

    // Geofence ENTER/EXIT transition events (r8): the alerting query a
    // telemetry user runs over the reference's GPS domain — per device,
    // emit an event whenever the containing geofence zone changes
    // between consecutive fixes (zone −1 = outside every fence). Built
    // from the q_geo_in_polygon containment pairs: min(poly_id) picks a
    // deterministic zone where fences overlap, a LEFT join restores the
    // outside fixes, and one per-user lag() window detects changes.
    // Scale shape: the containment equi-join + a bounded per-fix agg +
    // an event_id equi-join + ONE shuffle on user_id for the window —
    // no new join pattern beyond the audited ones.
    "q_geo_fence_events" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val zones = containmentPairs(s, d)
        .groupBy($"event_id").agg(min($"poly_id").as("zone"))
      val fx = Tables.events(s, d)
        .select($"event_id", $"user_id", msEpoch($"ts").as("ts_ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      fx.join(zones, Seq("event_id"), "left")
        .withColumn("zone", coalesce($"zone", lit(-1L)))
        .withColumn("prev_zone", lag($"zone", 1).over(w))
        .filter($"prev_zone".isNotNull && $"prev_zone" =!= $"zone")
        .select($"user_id", $"event_id", $"ts_ms",
          $"prev_zone".as("from_zone"), $"zone".as("to_zone"))
        .orderBy($"user_id", $"ts_ms", $"event_id")
    }),

    // Nearest POI ranked by great-circle km (r8): the haversine-ranked
    // sibling of q_geo_nearest_poi — "nearest POI in km" is what a
    // telemetry user actually asks; degree-space L2 is anisotropic in
    // longitude away from the equator, so the winner can genuinely
    // differ. Same scale shape: the R-degree 9-cell probe bounds the
    // candidate set (exhaustive by construction for the declared
    // within-R gate), the km ranking only re-orders inside it; winner
    // stays an order-independent min(struct). Kernel: Scalars
    // .haversineKm (composed built-ins, oracle-proven in q_fn_haversine).
    "q_geo_nearest_poi_km" -> ((s, d) => {
      import s.implicits._
      val R = 2.0
      val fixes = Tables.events(s, d).select($"event_id",
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val poi = Tables.nation(s, d).select($"n_nationkey".as("poi_id"),
        (($"n_nationkey" * 7.3) % 120.0 - 60.0).as("lat_p"),
        (($"n_nationkey" * 13.7) % 240.0 - 120.0).as("lon_p"))
      val fCell = fixes
        .withColumn("ci", floor($"lat" / R)).withColumn("cj", floor($"lon" / R))
      val pCell = poi
        .withColumn("ci", explode(array((-1 to 1).map(dI =>
          floor($"lat_p" / R) + dI): _*)))
        .withColumn("cj", explode(array((-1 to 1).map(dJ =>
          floor($"lon_p" / R) + dJ): _*)))
      val distDeg = sqrt(($"lat" - $"lat_p") * ($"lat" - $"lat_p") +
        ($"lon" - $"lon_p") * ($"lon" - $"lon_p"))
      fCell.join(pCell, Seq("ci", "cj"))
        .withColumn("dist_deg", distDeg)
        .filter($"dist_deg" <= R)
        .withColumn("km", Scalars.haversineKm($"lat", $"lon", $"lat_p", $"lon_p"))
        .groupBy($"event_id")
        .agg(min(struct($"km", $"poi_id")).as("w"))
        .select($"event_id", $"w.poi_id".as("poi_id"), round($"w.km", 6).as("dist_km"))
        .orderBy($"event_id")
    }),

    // Geofence DWELL-TIME analytics (r8): per (device, fence) total
    // time inside, visit count, fix count — the "how long did each
    // vehicle spend in each zone" report that pairs with the
    // enter/exit event stream. Interval attribution: a fix's zone
    // holds until the device's next fix (lead), the final fix
    // contributes no dwell; a visit starts where the previous fix's
    // zone differs (or at series start). Same containment relation +
    // the SAME single user-keyed shuffle as q_geo_fence_events (lead
    // and lag share one window), then a (user, zone) partial agg.
    "q_geo_fence_dwell" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val zones = containmentPairs(s, d)
        .groupBy($"event_id").agg(min($"poly_id").as("zone"))
      val fx = Tables.events(s, d)
        .select($"event_id", $"user_id", msEpoch($"ts").as("ts_ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      fx.join(zones, Seq("event_id"), "left")
        .withColumn("zone", coalesce($"zone", lit(-1L)))
        .withColumn("next_ms", lead($"ts_ms", 1).over(w))
        .withColumn("prev_zone", lag($"zone", 1).over(w))
        .filter($"zone" =!= -1L)
        .groupBy($"user_id", $"zone")
        .agg(
          sum(when($"next_ms".isNotNull, $"next_ms" - $"ts_ms").otherwise(0L)).as("dwell_ms"),
          count(lit(1)).as("n_fixes"),
          sum(when($"prev_zone".isNull || $"prev_zone" =!= $"zone", 1L).otherwise(0L)).as("n_visits"))
        .orderBy($"user_id", $"zone")
    }),

    // Convoy / co-travel detection (r8): device pairs repeatedly
    // co-located — same 6 h time bucket, within D = 5.0° — in >= 3
    // distinct buckets. The spatio-TEMPORAL instance of the grid
    // pattern: candidates meet via an EQUI-join on (bucket, cell) with
    // the b-side exploded to its 9-cell neighborhood (cell width
    // W = D, so any pair within D shares a probe cell by construction,
    // and each ordered fix pair meets exactly once — the a-side binds
    // only its own cell); user_a < user_b then keeps one orientation
    // per unordered pair, and COUNT(DISTINCT bucket) collapses
    // multiple same-bucket encounters. No BNLJ, no all-pairs: the join
    // is per-(bucket, cell) products, linear-ish when fixes spread, and
    // both sides can be huge. Oracle affords the per-bucket quadratic.
    "q_geo_convoy" -> ((s, d) =>
      convoyPairs(s, d).orderBy(col("user_a"), col("user_b"))),

    // Travel-group resolution (r8): connected components over the
    // convoy pair graph — "which devices form a traveling group", the
    // fleet-analytics step convoy PAIRS alone don't answer (A–B and
    // B–C pairs don't say {A,B,C} is one group). Reuses the
    // DedupClusters operator verbatim (min-label propagation with
    // pointer jumping, O(log diameter) rounds, lineage truncation) —
    // the operator is graph-generic; this is its second domain.
    // group_id = min user in the component, the dedup-canonical
    // discipline. Oracle: the same recursive-CTE closure the dedup
    // family uses, over the convoy CTE chain.
    "q_geo_groups" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val pairs = convoyPairs(s, d)
        .select($"user_a".as("doc_a"), $"user_b".as("doc_b"))
      graft.operators.DedupClusters.resolve(s, pairs)
        .withColumn("group_size",
          count(lit(1)).over(Window.partitionBy($"canonical")))
        .select($"doc_id".as("user_id"), $"canonical".as("group_id"),
          $"group_size")
        .orderBy($"user_id")
    }),

    // Spatial hotspot regions (r8): density cells above a
    // data-relative threshold (1.5× the global mean cell count),
    // merged into contiguous regions via 8-neighbor adjacency — the
    // "where does the fleet concentrate" heatmap-segmentation query,
    // and the THIRD domain for the DedupClusters CC kernel (dedup
    // graphs, convoy groups, now spatial regions). Scale shape: the
    // only input-linear stage is the first cell groupBy (partial-agg
    // shuffle of (cell, count) partials); everything after is bounded
    // by the GRID (≤ 36×72 cells whatever the input volume) — the
    // 9-key neighbor explode is an equi-join on cell key (no spatial
    // cross join), and the CC fixpoint runs on a few hundred nodes.
    // Threshold is sum/count in identical double arithmetic both
    // engines; singleton dense cells (no dense neighbor) become their
    // own hotspot via the left-join coalesce.
    "q_geo_hotspots" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val C = 5.0
      val cells = Tables.events(s, d).select(
          floor(($"value" % 180.0 - 90.0) / C).cast("long").as("cell_lat"),
          floor((($"event_id" % 3600) / 10.0 - 180.0) / C).cast("long").as("cell_lon"))
        .groupBy($"cell_lat", $"cell_lon").agg(count(lit(1)).as("n_fixes"))
      val thr = cells.agg(
        (sum($"n_fixes").cast("double") / count(lit(1))).as("mean_n"))
      // CacheScope: dense is referenced three times (neighbor explode,
      // equi-join probe side, final membership join) — without the
      // cache each reference re-derives the full cell aggregate and
      // its 1-row threshold broadcast (3 scans + 3 BNLJs in the plan)
      // (eager — the three consumers are concurrent scan stages).
      // SHARED since r19 (was query-local): the fill is the only
      // input-linear stage and was re-paid per invocation for a
      // deterministic, GRID-bounded output (≤ 36×72 cells at any
      // corpus size — output-sized, not corpus-sized); released via
      // drainShared like the convoy/occupancy caches.
      val dense = graft.CacheScope.sharedEager(cells.crossJoin(broadcast(thr))
        .filter($"n_fixes" > $"mean_n" * 1.5)
        .select($"cell_lat", $"cell_lon", $"n_fixes",
          ($"cell_lat" * 1000 + $"cell_lon").as("k")))
      val offsets = for { dy <- Seq(-1L, 0L, 1L); dx <- Seq(-1L, 0L, 1L)
                          if !(dy == 0L && dx == 0L) } yield (dy, dx)
      val nbr = dense.select($"k".as("k_a"), explode(array(offsets.map {
          case (dy, dx) =>
            ($"cell_lat" + dy) * 1000 + ($"cell_lon" + dx) }: _*)).as("k_b"))
      val edges = nbr.join(dense.select($"k".as("k_b")), Seq("k_b"))
        .filter($"k_a" < $"k_b")
        .select($"k_a".as("doc_a"), $"k_b".as("doc_b"))
      val labels = graft.operators.DedupClusters.resolve(s, edges)
        .select(col("doc_id").as("k"), col("canonical"))
      dense.join(labels, Seq("k"), "left")
        .withColumn("hotspot_id", coalesce($"canonical", $"k"))
        .withColumn("n_cells",
          count(lit(1)).over(Window.partitionBy($"hotspot_id")))
        .withColumn("hotspot_fixes",
          sum($"n_fixes").over(Window.partitionBy($"hotspot_id")))
        .select($"cell_lat", $"cell_lon", $"n_fixes", $"hotspot_id",
          $"n_cells", $"hotspot_fixes")
        .orderBy($"cell_lat", $"cell_lon")
    }),

    // WKT point construction — lon first, C-style %f six-decimal
    // formatting, exactly the reference's fmt.Sprintf (main.go:210).
    "q_geo_wkt_point" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id",
          format_string("POINT(%f %f)", $"value" * lit(2.0), $"value").as("geo_point"))
        .orderBy($"event_id")
    }),

    // CDC key-churn monitor (r8): per-key version counts and update
    // cadence from the CDC event log — the operational query behind
    // "which keys dominate the change stream" (hot-key skew in the
    // sink, compaction pressure in the replica, runaway producers).
    // ONE partial-agg groupBy on the key (count/min/max/countDistinct
    // all combine map-side) and a top-50 that plans as
    // TakeOrderedAndProject — no global sort, no window, no second
    // shuffle at any scale.
    "q_cdc_churn" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", msEpoch($"ts").as("ms"), $"value")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_versions"),
          countDistinct($"value").as("nd_values"),
          min($"ms").as("first_ms"), max($"ms").as("last_ms"))
        .withColumn("lifespan_ms", $"last_ms" - $"first_ms")
        .withColumn("avg_gap_ms",
          when($"n_versions" > 1,
            round($"lifespan_ms".cast(DoubleType) /
              ($"n_versions" - 1).cast(DoubleType), 6)))
        .orderBy($"n_versions".desc, $"user_id")
        .limit(50)
    }),

    // POI pairwise distance matrix (r8): great-circle km between every
    // pair of points of interest — the reference-data relation a
    // dispatch/routing layer keeps alongside the POI table itself.
    // The POI side is the small dimension BY CONSTRUCTION (a POI
    // catalog is thousands of rows while fixes are billions), so the
    // deliberate n² here is a broadcast self-join over the catalog
    // only — fixes never enter the plan. Same synthetic POI lattice
    // as q_geo_nearest_poi (nation-derived, trig-free), ranked by the
    // proven haversine kernel.
    "q_geo_distance_matrix" -> ((s, d) => {
      import s.implicits._
      def poi = Tables.nation(s, d).select($"n_nationkey".as("poi_id"),
        (($"n_nationkey" * 7.3) % 120.0 - 60.0).as("lat"),
        (($"n_nationkey" * 13.7) % 240.0 - 120.0).as("lon"))
      poi.as("a").join(broadcast(poi.as("b")), $"a.poi_id" < $"b.poi_id")
        .select($"a.poi_id".as("poi_a"), $"b.poi_id".as("poi_b"),
          round(Scalars.haversineKm($"a.lat", $"a.lon", $"b.lat", $"b.lon"), 6).as("km"))
        .orderBy($"poi_a", $"poi_b")
    }),

    // Per-user location entropy (r8): Shannon entropy of each device's
    // grid-cell visit distribution — the mobility-literature
    // predictability measure that pairs with q_geo_radius_gyration
    // (Rg says how FAR a user ranges, entropy says how CONCENTRATED
    // the ranging is; a commuter has large Rg, low entropy). Shape:
    // one (user, cell) partial-agg count, one user-keyed total fold,
    // one co-partitioned join back — every relation is user- or
    // (user, cell)-keyed, nothing global. Determinism is the
    // q_profile_entropy discipline: exact integer IEEE division for
    // p, log2 pinned at 6dp per value, DECIMAL-summed terms, final
    // round(6); normalized by log2(n_cells) for cross-user compare.
    "q_geo_entropy" -> ((s, d) => {
      import s.implicits._
      val W = 1.0
      val cells = Tables.events(s, d)
        .select($"user_id",
          floor(($"value" % 180.0 - 90.0) / W).as("ci"),
          floor(((($"event_id" % 3600) / 10.0) - 180.0) / W).as("cj"))
        .groupBy($"user_id", $"ci", $"cj")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy($"user_id")
        .agg(sum($"n").cast(DoubleType).as("n_total"),
          count(lit(1)).as("n_cells"))
      cells.join(tot, "user_id")
        .withColumn("p", $"n".cast(DoubleType) / $"n_total")
        .withColumn("logp", round(log2($"p"), 6))
        .groupBy($"user_id", $"n_cells")
        .agg(round(-(sum(graft.Determinism.dec($"p" * $"logp"))
          .cast(DoubleType)), 6).as("entropy_bits"))
        .withColumn("norm_entropy",
          when($"n_cells" > 1,
            round($"entropy_bits" /
              round(log2($"n_cells".cast(DoubleType)), 6), 6))
            .otherwise(lit(0.0)))
        .select($"user_id", $"n_cells", $"entropy_bits", $"norm_entropy")
        .orderBy($"user_id")
    }),

    // Home/work anchor detection (r8): each device's top-2 grid cells
    // by fix count — the mobility-literature anchor heuristic (the
    // two dominant dwell locations are home and work/second base);
    // feeds labeling, geofence seeding, and the entropy/Rg profile's
    // interpretation. One (user, cell) partial-agg count, then the
    // rank window runs PER USER over that user's own cells — the
    // window input is cells-per-user, not fixes, so the aggregate
    // absorbs the volume. Total tiebreak (count desc, cell asc).
    "q_geo_home_work" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val W = 1.0
      Tables.events(s, d)
        .select($"user_id",
          floor(($"value" % 180.0 - 90.0) / W).as("ci"),
          floor(((($"event_id" % 3600) / 10.0) - 180.0) / W).as("cj"))
        .groupBy($"user_id", $"ci", $"cj")
        .agg(count(lit(1)).as("n_fixes"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"user_id")
            .orderBy($"n_fixes".desc, $"ci", $"cj")).cast("long"))
        .filter($"rk" <= 2)
        .withColumn("anchor", when($"rk" === 1, "primary").otherwise("secondary"))
        .select($"user_id", $"rk", $"anchor", $"ci", $"cj", $"n_fixes")
        .orderBy($"user_id", $"rk")
    })
  )

  /** Shared oracle CTE text: the synthetic fix positions (lat from
    * value, lon from event_id — see q_geo_nearest_poi's independence
    * note) and the octagon geofence polygons + per-polygon edge table
    * (see q_geo_in_polygon). Used by the geofence-family oracles. */
  private val sqlFixes =
    "f AS (SELECT event_id, value % 180.0 - 90.0 AS lat, " +
    "(event_id % 3600) / 10.0 - 180.0 AS lon FROM events)"
  private val sqlPolyEdges =
    // coefficients CAST to DOUBLE so DuckDB runs the same IEEE
    // arithmetic as Spark (DECIMAL-exact evaluation could flip an
    // edge-crossing comparison)
    "p AS (SELECT CAST(n_nationkey AS BIGINT) AS poly_id, " +
    "(n_nationkey * CAST(7.3 AS DOUBLE)) % 120.0 - 60.0 AS clat, " +
    "(n_nationkey * CAST(13.7 AS DOUBLE)) % 240.0 - 120.0 AS clon, " +
    "CAST(3.0 AS DOUBLE) + n_nationkey % 4 AS rmax FROM nation), " +
    "u(i, ux, uy) AS (VALUES (0, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), " +
    "(1, 0.7, 0.7), (2, 0.0, 1.0), (3, -0.7, 0.7), (4, -1.0, 0.0), " +
    "(5, -0.7, -0.7), (6, 0.0, -1.0), (7, 0.7, -0.7)), " +
    "v AS (SELECT poly_id, i, " +
    "clon + rmax * (CAST(0.6 AS DOUBLE) + CAST(0.4 AS DOUBLE) * ((i * 7 + poly_id) % 5) / 5.0) * ux AS x, " +
    "clat + rmax * (CAST(0.6 AS DOUBLE) + CAST(0.4 AS DOUBLE) * ((i * 7 + poly_id) % 5) / 5.0) * uy AS y " +
    "FROM p CROSS JOIN u), " +
    "e AS (SELECT a.poly_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2 " +
    "FROM v a JOIN v b ON a.poly_id = b.poly_id AND b.i = (a.i + 1) % 8)"
  /** bbox-candidate + even-odd ray-cast CTEs over sqlFixes/sqlPolyEdges:
    * `inp` = the (event_id, poly_id) containment pairs. */
  private val sqlInPolygon =
    "cand AS (SELECT event_id, lat, lon, p.poly_id " +
    "FROM f JOIN p ON abs(lat - clat) <= rmax AND abs(lon - clon) <= rmax), " +
    "n AS (SELECT event_id, cand.poly_id, " +
    "SUM(CASE WHEN ((y1 > lat) <> (y2 > lat)) AND " +
    "(((lat - y1) * (x2 - x1) - (lon - x1) * (y2 - y1) > 0) = (y2 > y1)) " +
    "THEN 1 ELSE 0 END) AS ncross " +
    "FROM cand JOIN e ON e.poly_id = cand.poly_id GROUP BY 1, 2), " +
    "inp AS (SELECT event_id, poly_id FROM n WHERE ncross % 2 = 1)"

  val oracle: Map[String, String] = Map(
    "q_proj_flatten" ->
      ("SELECT event_id AS id, user_id AS device_id, date_trunc('milliseconds', ts) AS ts_ms, " +
       "CAST(json_extract(props, '$.k') AS INTEGER) AS k, value AS speed FROM events ORDER BY id"),
    "q_proj_rename" ->
      "SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment FROM customer ORDER BY cust_id",
    "q_filter_basic" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem " +
       "WHERE l_quantity > 30.0 AND l_discount < 0.05 ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount"),
    "q_filter_in_between" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders " +
       "WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000.0 AND 200000.0 " +
       "AND o_orderpriority LIKE '%URGENT%' AND o_custkey IS NOT NULL ORDER BY o_orderkey"),
    "q_codec_json_decode" ->
      ("SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k_int, " +
       "json_extract_string(props, '$.k') AS k_str FROM events ORDER BY event_id"),
    "q_codec_json_encode" ->
      ("SELECT event_id, '{\"schema\":{\"type\":\"struct\",\"fields\":[{\"type\":\"string\",\"field\":\"id\"},{\"type\":\"string\",\"field\":\"device_id\"}]},\"payload\":' " +
       "|| CAST(to_json({'id': CAST(event_id AS VARCHAR), 'device_id': event_type}) AS VARCHAR) || '}' AS envelope " +
       "FROM events ORDER BY event_id"),
    "q_cdc_after_image" ->
      ("SELECT event_id, CAST(event_id AS VARCHAR) AS id, " +
       "CAST(printf('%.6f', value) AS DOUBLE) AS latitude, " +
       "CAST(printf('%.6f', value * 2.0) AS DOUBLE) AS longitude " +
       "FROM events ORDER BY event_id"),
    "q_cdc_scd2" ->
      ("WITH e AS (SELECT event_id, user_id, value, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS valid_from_ms FROM events) " +
       "SELECT event_id, user_id, value, valid_from_ms, " +
       "lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY valid_from_ms, event_id) AS valid_to_ms, " +
       "lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY valid_from_ms, event_id) IS NULL AS is_current " +
       "FROM e ORDER BY event_id"),
    "q_cdc_snapshot" ->
      ("WITH e AS (SELECT user_id, event_id, value, event_type, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn " +
       "FROM e), c AS (SELECT user_id, COUNT(*) AS n_events FROM e GROUP BY user_id) " +
       "SELECT r.user_id, n_events, event_id AS last_event_id, ms AS last_ms, " +
       "value AS last_value, event_type AS last_type " +
       "FROM r JOIN c ON r.user_id = c.user_id WHERE rn = 1 ORDER BY r.user_id"),
    "q_cdc_snapshot_deletes" ->
      ("WITH e AS (SELECT user_id, event_id, value, event_type, " +
       "CASE WHEN event_id % 7 = 0 THEN 'd' ELSE 'u' END AS op, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn " +
       "FROM e), c AS (SELECT user_id, COUNT(*) AS n_events FROM e GROUP BY user_id) " +
       "SELECT r.user_id, n_events, event_id AS last_event_id, ms AS last_ms, " +
       "value AS last_value, event_type AS last_type " +
       "FROM r JOIN c ON r.user_id = c.user_id WHERE rn = 1 AND op <> 'd' ORDER BY r.user_id"),
    "q_cdc_asof_snapshot" ->
      ("WITH e AS (SELECT user_id, event_id, value, event_type, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events " +
       "WHERE epoch_ms(date_trunc('milliseconds', ts)) < 1705276800000), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn " +
       "FROM e), c AS (SELECT user_id, COUNT(*) AS n_events FROM e GROUP BY user_id) " +
       "SELECT r.user_id, n_events, event_id AS last_event_id, ms AS last_ms, " +
       "value AS last_value, event_type AS last_type " +
       "FROM r JOIN c ON r.user_id = c.user_id WHERE rn = 1 ORDER BY r.user_id"),
    "q_cdc_asof_diff" ->
      ("WITH e AS (SELECT user_id, event_id, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events " +
       "WHERE epoch_ms(date_trunc('milliseconds', ts)) < 1705276800000), " +
       "r2 AS (SELECT user_id, event_id, row_number() OVER " +
       "(PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn FROM e), " +
       "r1 AS (SELECT user_id, event_id, row_number() OVER " +
       "(PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn FROM e " +
       "WHERE ms < 1704088800000), " +
       "b AS (SELECT user_id, COUNT(*) FILTER (WHERE ms >= 1704088800000) AS n_between " +
       "FROM e GROUP BY user_id) " +
       "SELECT e2.user_id, " +
       "CASE WHEN e1.event_id IS NULL THEN 'added' " +
       "WHEN e1.event_id <> e2.event_id THEN 'changed' ELSE 'same' END AS change_type, " +
       "e1.event_id AS event_id_t1, e2.event_id AS event_id_t2, n_between " +
       "FROM (SELECT user_id, event_id FROM r2 WHERE rn = 1) e2 " +
       "LEFT JOIN (SELECT user_id, event_id FROM r1 WHERE rn = 1) e1 ON e1.user_id = e2.user_id " +
       "JOIN b ON b.user_id = e2.user_id ORDER BY e2.user_id"),
    "q_geo_cell_agg" ->
      ("WITH f AS (SELECT event_id, user_id, value % 180.0 - 90.0 AS lat, " +
       "value % 360.0 - 180.0 AS lon FROM events) " +
       "SELECT CAST(floor(lat / 0.5) AS BIGINT) AS cell_lat, " +
       "CAST(floor(lon / 0.5) AS BIGINT) AS cell_lon, " +
       "COUNT(*) AS n_fixes, COUNT(DISTINCT user_id) AS n_devices, " +
       sqlSumd("lat") + " AS sum_lat " +
       "FROM f WHERE lat BETWEEN -60.0 AND 60.0 AND lon BETWEEN -120.0 AND 120.0 " +
       "GROUP BY 1, 2 ORDER BY cell_lat, cell_lon"),
    "q_geo_cell_smooth" ->
      ("WITH f AS (SELECT value % 180.0 - 90.0 AS lat, value % 360.0 - 180.0 AS lon FROM events), " +
       "g AS (SELECT CAST(floor(lat / 0.5) AS BIGINT) AS cell_lat, " +
       "CAST(floor(lon / 0.5) AS BIGINT) AS cell_lon, COUNT(*) AS n " +
       "FROM f WHERE lat BETWEEN -60.0 AND 60.0 AND lon BETWEEN -120.0 AND 120.0 GROUP BY 1, 2), " +
       "o AS (SELECT dx.x AS dx, dy.x AS dy FROM (SELECT unnest([-1,0,1]) AS x) dx " +
       "CROSS JOIN (SELECT unnest([-1,0,1]) AS x) dy), " +
       "c AS (SELECT cell_lat + dx AS t_lat, cell_lon + dy AS t_lon, n, dx, dy FROM g CROSS JOIN o) " +
       "SELECT t_lat AS cell_lat, t_lon AS cell_lon, " +
       "CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END) AS BIGINT) AS n_self, " +
       "CAST(SUM(n) AS BIGINT) AS ring_total, " +
       "round(CAST(SUM(n) AS DOUBLE) / 9.0, 6) AS smoothed " +
       "FROM c GROUP BY t_lat, t_lon " +
       "HAVING SUM(CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END) > 0 " +
       "ORDER BY cell_lat, cell_lon"),
    "q_geo_nearest_poi" ->
      ("WITH f AS (SELECT event_id, value % 180.0 - 90.0 AS lat, " +
       "(event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "p AS (SELECT n_nationkey AS poi_id, (n_nationkey * 7.3) % 120.0 - 60.0 AS lat_p, " +
       "(n_nationkey * 13.7) % 240.0 - 120.0 AS lon_p FROM nation), " +
       "j AS (SELECT event_id, poi_id, " +
       "sqrt((lat - lat_p) * (lat - lat_p) + (lon - lon_p) * (lon - lon_p)) AS dist " +
       "FROM f CROSS JOIN p), " +
       "r AS (SELECT event_id, poi_id, dist, " +
       "row_number() OVER (PARTITION BY event_id ORDER BY dist, poi_id) AS rn " +
       "FROM j WHERE dist <= 2.0) " +
       "SELECT event_id, poi_id, round(dist, 6) AS dist FROM r WHERE rn = 1 " +
       "ORDER BY event_id"),
    "q_cdc_table_diff" ->
      ("WITH old AS (SELECT doc_id, lang, source, n_chars FROM documents), " +
       "nw AS (SELECT doc_id, lang, source, " +
       "CASE WHEN doc_id % 10 = 5 THEN n_chars + 1 ELSE n_chars END AS n_chars " +
       "FROM old WHERE doc_id % 10 <> 3 " +
       "UNION ALL SELECT doc_id + 1000000, lang, source, n_chars FROM old WHERE doc_id % 10 = 7), " +
       "o AS (SELECT doc_id, md5(COALESCE(lang, chr(1)) || '|' || COALESCE(source, chr(1)) || '|' || COALESCE(CAST(n_chars AS VARCHAR), chr(1))) AS rh_old FROM old), " +
       "n AS (SELECT doc_id, md5(COALESCE(lang, chr(1)) || '|' || COALESCE(source, chr(1)) || '|' || COALESCE(CAST(n_chars AS VARCHAR), chr(1))) AS rh_new FROM nw), " +
       "j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, rh_old, rh_new " +
       "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) " +
       "SELECT CASE WHEN rh_old IS NULL THEN 'added' WHEN rh_new IS NULL THEN 'removed' " +
       "WHEN rh_old <> rh_new THEN 'changed' ELSE 'same' END AS status, " +
       "COUNT(*) AS n, MIN(doc_id) AS min_key, MAX(doc_id) AS max_key " +
       "FROM j GROUP BY 1 ORDER BY status"),
    "q_geo_in_polygon" ->
      (s"WITH $sqlFixes, $sqlPolyEdges, $sqlInPolygon " +
       "SELECT event_id, poly_id FROM inp ORDER BY event_id, poly_id"),
    "q_geo_fence_events" ->
      (s"WITH $sqlFixes, $sqlPolyEdges, $sqlInPolygon, " +
       "z AS (SELECT event_id, MIN(poly_id) AS zone FROM inp GROUP BY event_id), " +
       "fx AS (SELECT event_id, user_id, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms FROM events), " +
       "s AS (SELECT fx.event_id, user_id, ts_ms, COALESCE(zone, -1) AS zone " +
       "FROM fx LEFT JOIN z ON z.event_id = fx.event_id), " +
       "t AS (SELECT user_id, event_id, ts_ms, zone, " +
       "lag(zone) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_zone FROM s) " +
       "SELECT user_id, event_id, ts_ms, prev_zone AS from_zone, zone AS to_zone " +
       "FROM t WHERE prev_zone IS NOT NULL AND prev_zone <> zone " +
       "ORDER BY user_id, ts_ms, event_id"),
    "q_geo_nearest_poi_km" ->
      ("WITH f AS (SELECT event_id, value % 180.0 - 90.0 AS lat, " +
       "(event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "p AS (SELECT n_nationkey AS poi_id, (n_nationkey * 7.3) % 120.0 - 60.0 AS lat_p, " +
       "(n_nationkey * 13.7) % 240.0 - 120.0 AS lon_p FROM nation), " +
       "j AS (SELECT event_id, poi_id, " +
       "sqrt((lat - lat_p) * (lat - lat_p) + (lon - lon_p) * (lon - lon_p)) AS dist_deg, " +
       Scalars.sqlHaversine("lat", "lon", "lat_p", "lon_p") + " AS km " +
       "FROM f CROSS JOIN p), " +
       "r AS (SELECT event_id, poi_id, km, " +
       "row_number() OVER (PARTITION BY event_id ORDER BY km, poi_id) AS rn " +
       "FROM j WHERE dist_deg <= 2.0) " +
       "SELECT event_id, poi_id, round(km, 6) AS dist_km FROM r WHERE rn = 1 " +
       "ORDER BY event_id"),
    "q_geo_fence_dwell" ->
      (s"WITH $sqlFixes, $sqlPolyEdges, $sqlInPolygon, " +
       "z AS (SELECT event_id, MIN(poly_id) AS zone FROM inp GROUP BY event_id), " +
       "fx AS (SELECT event_id, user_id, " +
       "epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms FROM events), " +
       "s AS (SELECT fx.event_id, user_id, ts_ms, COALESCE(zone, -1) AS zone " +
       "FROM fx LEFT JOIN z ON z.event_id = fx.event_id), " +
       "t AS (SELECT user_id, event_id, ts_ms, zone, " +
       "lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS next_ms, " +
       "lag(zone) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_zone FROM s) " +
       "SELECT user_id, zone, " +
       "CAST(SUM(CASE WHEN next_ms IS NOT NULL THEN next_ms - ts_ms ELSE 0 END) AS BIGINT) AS dwell_ms, " +
       "COUNT(*) AS n_fixes, " +
       "CAST(SUM(CASE WHEN prev_zone IS NULL OR prev_zone <> zone THEN 1 ELSE 0 END) AS BIGINT) AS n_visits " +
       "FROM t WHERE zone <> -1 GROUP BY user_id, zone ORDER BY user_id, zone"),
    "q_geo_groups" ->
      ("WITH RECURSIVE e AS (SELECT user_id, " +
       "CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 21600000.0) AS BIGINT) AS bk, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "p AS (SELECT a.user_id AS user_a, b.user_id AS user_b, a.bk " +
       "FROM e a JOIN e b ON a.bk = b.bk AND a.user_id < b.user_id " +
       "AND sqrt((a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)) <= 5.0), " +
       "g AS (SELECT user_a, user_b FROM p GROUP BY user_a, user_b " +
       "HAVING COUNT(DISTINCT bk) >= 3), " +
       "ed AS (SELECT user_a AS src, user_b AS dst FROM g " +
       "UNION SELECT user_b, user_a FROM g), " +
       "r AS (SELECT src, dst FROM ed " +
       "UNION SELECT r.src, ed.dst FROM r JOIN ed ON r.dst = ed.src), " +
       "reach AS (SELECT src AS user_id, dst FROM r UNION SELECT src, src FROM ed), " +
       "lab AS (SELECT user_id, MIN(dst) AS group_id FROM reach GROUP BY user_id) " +
       "SELECT user_id, group_id, " +
       "COUNT(*) OVER (PARTITION BY group_id) AS group_size " +
       "FROM lab ORDER BY user_id"),
    "q_geo_hotspots" ->
      ("WITH RECURSIVE c AS (SELECT CAST(floor((value % 180.0 - 90.0) / 5.0) AS BIGINT) AS cell_lat, " +
       "CAST(floor(((event_id % 3600) / 10.0 - 180.0) / 5.0) AS BIGINT) AS cell_lon FROM events), " +
       "g AS (SELECT cell_lat, cell_lon, COUNT(*) AS n_fixes FROM c GROUP BY 1, 2), " +
       "m AS (SELECT CAST(SUM(n_fixes) AS DOUBLE) / COUNT(*) AS mean_n FROM g), " +
       "d AS (SELECT cell_lat, cell_lon, n_fixes, cell_lat * 1000 + cell_lon AS k " +
       "FROM g, m WHERE n_fixes > mean_n * 1.5), " +
       "e0 AS (SELECT a.k AS k_a, b.k AS k_b FROM d a JOIN d b " +
       "ON abs(a.cell_lat - b.cell_lat) <= 1 AND abs(a.cell_lon - b.cell_lon) <= 1 AND a.k < b.k), " +
       "ed AS (SELECT k_a AS src, k_b AS dst FROM e0 UNION SELECT k_b, k_a FROM e0), " +
       "r AS (SELECT src, dst FROM ed " +
       "UNION SELECT r.src, ed.dst FROM r JOIN ed ON r.dst = ed.src), " +
       "reach AS (SELECT src AS k, dst FROM r UNION SELECT src, src FROM ed), " +
       "lab AS (SELECT k, MIN(dst) AS canonical FROM reach GROUP BY k), " +
       "mm AS (SELECT d.cell_lat, d.cell_lon, d.n_fixes, " +
       "COALESCE(l.canonical, d.k) AS hotspot_id FROM d LEFT JOIN lab l ON d.k = l.k) " +
       "SELECT cell_lat, cell_lon, n_fixes, hotspot_id, " +
       "COUNT(*) OVER (PARTITION BY hotspot_id) AS n_cells, " +
       "CAST(SUM(n_fixes) OVER (PARTITION BY hotspot_id) AS BIGINT) AS hotspot_fixes " +
       "FROM mm ORDER BY cell_lat, cell_lon"),
    "q_geo_convoy" ->
      ("WITH e AS (SELECT user_id, " +
       "CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 21600000.0) AS BIGINT) AS bk, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "p AS (SELECT a.user_id AS user_a, b.user_id AS user_b, a.bk " +
       "FROM e a JOIN e b ON a.bk = b.bk AND a.user_id < b.user_id " +
       "AND sqrt((a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)) <= 5.0), " +
       "g AS (SELECT user_a, user_b, COUNT(DISTINCT bk) AS n_buckets, " +
       "MIN(bk) AS first_bk, MAX(bk) AS last_bk FROM p GROUP BY user_a, user_b) " +
       "SELECT user_a, user_b, n_buckets, first_bk, last_bk FROM g " +
       "WHERE n_buckets >= 3 ORDER BY user_a, user_b"),
    "q_geo_wkt_point" ->
      ("SELECT event_id, printf('POINT(%f %f)', value * 2.0, value) AS geo_point " +
       "FROM events ORDER BY event_id"),
    "q_cdc_churn" ->
      ("WITH e AS (SELECT user_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, value FROM events), " +
       "g AS (SELECT user_id, COUNT(*) AS n_versions, COUNT(DISTINCT value) AS nd_values, " +
       "MIN(ms) AS first_ms, MAX(ms) AS last_ms FROM e GROUP BY user_id) " +
       "SELECT user_id, n_versions, nd_values, first_ms, last_ms, " +
       "last_ms - first_ms AS lifespan_ms, " +
       "CASE WHEN n_versions > 1 THEN round(CAST(last_ms - first_ms AS DOUBLE) / (n_versions - 1), 6) END AS avg_gap_ms " +
       "FROM g ORDER BY n_versions DESC, user_id LIMIT 50"),
    "q_geo_distance_matrix" ->
      ("WITH poi AS (SELECT n_nationkey AS poi_id, " +
       "(n_nationkey * 7.3) % 120.0 - 60.0 AS lat, " +
       "(n_nationkey * 13.7) % 240.0 - 120.0 AS lon FROM nation) " +
       "SELECT a.poi_id AS poi_a, b.poi_id AS poi_b, " +
       "round(" + Scalars.sqlHaversine("a.lat", "a.lon", "b.lat", "b.lon") + ", 6) AS km " +
       "FROM poi a JOIN poi b ON a.poi_id < b.poi_id ORDER BY poi_a, poi_b"),
    "q_geo_entropy" ->
      ("WITH c AS (SELECT user_id, " +
       "floor((value % 180.0 - 90.0) / 1.0) AS ci, " +
       "floor(((event_id % 3600) / 10.0 - 180.0) / 1.0) AS cj, " +
       "COUNT(*) AS n FROM events GROUP BY 1, 2, 3), " +
       "tot AS (SELECT user_id, CAST(SUM(n) AS DOUBLE) AS n_total, COUNT(*) AS n_cells " +
       "FROM c GROUP BY user_id), " +
       "term AS (SELECT c.user_id, n_cells, CAST(n AS DOUBLE) / n_total AS p, " +
       "round(log2(CAST(n AS DOUBLE) / n_total), 6) AS logp " +
       "FROM c JOIN tot ON c.user_id = tot.user_id), " +
       "h AS (SELECT user_id, n_cells, " +
       "round(-CAST(SUM(CAST(p * logp AS DECIMAL(38,6))) AS DOUBLE), 6) AS entropy_bits " +
       "FROM term GROUP BY user_id, n_cells) " +
       "SELECT user_id, n_cells, entropy_bits, " +
       "CASE WHEN n_cells > 1 THEN round(entropy_bits / round(log2(CAST(n_cells AS DOUBLE)), 6), 6) " +
       "ELSE 0.0 END AS norm_entropy " +
       "FROM h ORDER BY user_id"),
    "q_geo_home_work" ->
      ("WITH c AS (SELECT user_id, " +
       "CAST(floor((value % 180.0 - 90.0) / 1.0) AS BIGINT) AS ci, " +
       "CAST(floor(((event_id % 3600) / 10.0 - 180.0) / 1.0) AS BIGINT) AS cj, " +
       "COUNT(*) AS n_fixes FROM events GROUP BY 1, 2, 3), " +
       "r AS (SELECT user_id, ci, cj, n_fixes, " +
       "CAST(row_number() OVER (PARTITION BY user_id " +
       "ORDER BY n_fixes DESC, ci, cj) AS BIGINT) AS rk FROM c) " +
       "SELECT user_id, rk, CASE WHEN rk = 1 THEN 'primary' ELSE 'secondary' END AS anchor, " +
       "ci, cj, n_fixes FROM r WHERE rk <= 2 ORDER BY user_id, rk")
  )
}

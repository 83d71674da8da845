package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump final (AQE-settled) physical plans for representative queries
  * to PLANS.md — the `.explain`-and-iterate evidence that the plans we
  * rely on at 100 TB are the plans Catalyst actually produces. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks = Seq(
      "q_scan_pruned" -> "column pruning + ReadSchema reaches the parquet scan",
      "q_filter_basic" -> "predicate pushdown (PushedFilters) + whole-stage codegen",
      "q_join_inner_bhj" -> "broadcast hash join — fact side never shuffles",
      "q_agg_hash" -> "two-phase hash aggregate (partial_ map-side combine)",
      "q_limit_topk" -> "TakeOrderedAndProject — global top-k without a total sort",
      "q_llm_embed_neardup" -> ("block-partitioned pair join: shuffled EQUI-join on the " +
        "(block_a, block_b) key (no BroadcastNestedLoopJoin / full-table broadcast), " +
        "fused float_vec_dot kernel inside the pair loop"),
      "q_join_asof" -> "as-of via union + one sort per user + carry-forward (no pair inflation)",
      "q_llm_ngram_jaccard" -> ("capped shingle-share join: df<=" +
        graft.queries.Llm.MaxShingleDf + " filter bounds the hottest key"),
      "q_llm_pack_shards" -> ("RECURSIVE multi-level exact prefix sum (r5): every intra-bucket " +
        "window is PARTITIONED by _ps_bkt (parallel), exactly ONE single-partition exchange at the " +
        "recursion top (bounded by the fanout at any n), offsets return via AQE-sized joins"),
      "q_llm_edit_distance" -> ("length-bucketed blocked candidate join (r4): (brand, type, " +
        "length-bucket) equi-join with 3-way adjacent-bucket probe — exact for lev<=3, blocks " +
        "spread across the length distribution instead of pooling on the fixed (brand, type) domain"),
      "q_llm_tfidf" -> ("tf-idf: df(term) broadcast is GATED on the provable corpus-size bound " +
        "(hintIfCorpusSmall) — hinted at bench scale (skips the probe-side exchange), UNHINTED " +
        "above the gate where AQE decides from measured size"),
      "q_llm_dedup_keep_best" -> "per-cluster survivor: one order-independent max(struct) hash aggregate, no window",
      "q_llm_source_minhash" -> ("corpus-level MinHash sketch (r7): slot-wise partial_min " +
        "combines map-side — kernel maps + ONE source-keyed exchange, no document pair join"),
      "q_llm_pii_mask" -> "PII scrub: narrow codegen regex map over the scan, zero shuffles before the output sort",
      "q_llm_simhash_neardup" -> "banded simhash equi-join (pigeonhole-exact at hamming<=3)",
      "q_stream_tumble_twin" -> "windowed aggregate (same plan streaming runs incrementally)",
      "q_agg_salted_skew" -> "salted two-phase aggregation: (key,salt) shuffle then tiny key shuffle",
      "q_llm_window_chunks" -> "context-window chunking: narrow per-row Generate, zero shuffles before the output sort",
      "q_llm_unigram_lm" -> ("unigram-LM scoring: LM join is UNHINTED (vocab is 10^8-10^9 rows " +
        "at 100 TB) — AQE picks broadcast here from the measured runtime size; at real scale " +
        "it degrades to a term-keyed shuffle join with no extra pass"),
      "q_llm_embed_outlier" -> "centroid outlier scan: per-(label,dim) partial aggregate, tiny centroid arrays broadcast back, TakeOrderedAndProject top-k — no pair join",
      "q_cdc_snapshot" -> "latest-state materialization: order-independent max(struct) hash aggregate, no per-key sort",
      "q_cdc_snapshot_deletes" -> ("tombstone snapshot (r9): op rides inside the same max(struct) " +
        "fold after the unique (ms,event_id) prefix — ONE partial-aggregable groupBy, delete " +
        "handling is a post-agg filter on the folded row, no window, no second pass"),
      "q_llm_url_dedup" -> ("URL-canonicalization dedup (r9): narrow per-row regex rewrites over " +
        "the scan, ONE partial-agg hash groupBy on the canonical string — no joins, no windows; " +
        "the cheapest dedup-family member at any corpus size"),
      "q_win_ntile" -> ("ntile decile bucketing (r9): one source-partitioned window over a total " +
        "(n_chars, doc_id) order — single shuffle on source, per-partition bucket math"),
      "q_ts_resample" -> "resample + gap-fill: narrow per-user sequence Generate for the grid, shuffle only on user_id (agg + forward-fill window share the partitioning)",
      "q_llm_incr_dedup" -> ("incremental dedup (r7): the incoming batch's band relation is the " +
        "BROADCAST side of the candidate join — the base corpus side never shuffles for " +
        "candidate generation (the premise of incremental ingest)"),
      "q_profile_table" -> ("per-column profiling (r7): each exact distinct is its own value-keyed " +
        "distributed aggregate (parallel dedup, partial-agg count) broadcast-joined back as a " +
        "1-row relation — no Expand, no single-reducer distinct merge"),
      "q_geo_in_polygon" -> ("point-in-polygon geofencing (r8): polygons exploded into bbox grid " +
        "cells -> cell-key EQUI-join (no BNLJ even with both sides huge), division-free ray-cast " +
        "aggregate lambda as a narrow post-join map"),
      "q_geo_fence_events" -> ("geofence transitions (r8): containment equi-join + per-fix min " +
        "aggregate + event_id equi-join back + ONE user-keyed window — the alerting query's whole " +
        "dataflow in four partition-aligned stages"),
      "q_llm_bpe_iter" -> ("iterated BPE (r8): 3 merge rounds, each = vocab-sized pair count + " +
        "1-row winner BROADCAST crossJoin + narrow replace map — the corpus collapses to (word, wc) " +
        "once and nothing larger than the pair vocabulary ever shuffles again"),
      "q_geo_convoy" -> ("convoy co-travel detection (r8, hot-cell-guarded r10, auto-thinned r11): " +
        "(bucket, cell) EQUI-join with 9-cell neighborhood probe — the spatio-temporal grid pattern; " +
        "no BNLJ with both sides the full fix stream, pair dedup by orientation filter, " +
        "COUNT(DISTINCT bucket) partial-aggregable; the occupancy pass (raw + distinct-device counts " +
        "joined back on the SAME (bucket,cell) key, exchange reused) feeds the Boolean " +
        "when/otherwise(raise_error) guard that refuses only irreducibly-quadratic cells, and cells " +
        "past the RAW budget pre-thin per (device,bucket,cell) before the pair join"),
      "q_geo_od_matrix" -> ("origin-destination matrix (r8): trip lag chain + ONE order-independent " +
        "min/max(struct) endpoint aggregate (no second window) + grid-bounded flow count"),
      "q_llm_source_topterms" -> ("per-source top terms (r8): ranking window runs over the " +
        "VOCAB-sized (source, term) relation — corpus-size-invariant; df relation shared with tfidf"),
      "q_ts_interpolate" -> ("linear gap-fill (r8): BOTH directional ignoreNulls fills compute in " +
        "ONE Window node over one user-partitioned sort; bucket means broadcast onto the grid"),
      "q_geo_hotspots" -> ("hotspot segmentation (r8): input-linear cell aggregate, then a " +
        "GRID-bounded dense relation — 9-key neighbor explode equi-join (no spatial cross join) " +
        "feeding the CC fixpoint; 1-row threshold broadcast"),
      "q_llm_bm25" -> ("BM25 retrieval (r8): query-term filter BEFORE the doc groupBy (shuffle " +
        "carries hit partials only); df/stats 1-row broadcasts; top-100 is TakeOrderedAndProject"),
      "q_sql_tpch_q5ish" -> ("full Q5 six-table join through the SQL text (r8): all-BHJ star at " +
        "this SF, date range pushed to the orders scan, Catalyst free to reorder"),
      "q_llm_corpus_dedup" -> ("end-to-end corpus dedup (r8): pair relation -> CC -> keep-best " +
        "max(struct) -> ANTI join; loser side is dedup-rate-sized so AQE broadcasts it"),
      "q_llm_kmeans" -> ("oracle-checked Lloyd k-means (r11): per round ONE k-row broadcast join " +
        "(assignment embarrassingly parallel, DoubleVecDot codegen kernel, argmax as an " +
        "order-independent max(struct) partial agg) + ONE (cell,dim)-keyed partial-agg shuffle " +
        "with k·dim groups regardless of corpus size — no window over data rows anywhere"),
      "q_llm_semdedup" -> ("SemDeDup cluster-bounded dedup (r11): cell-keyed EQUI self-join " +
        "(candidate work n²/2k, never all-pairs), fused float_vec_dot rerank inside the join " +
        "stage, survivors into the DedupClusters fixpoint"),
      "q_llm_knn_graph_ann" -> ("ANN kNN graph (r11): (t,bucket)-keyed self-join from the CACHED " +
        "bucket relation, rank-limit pushdown inserts map-side WindowGroupLimit before every " +
        "exchange so only per-group top-3 survivors shuffle — the full Σ bucket² candidate " +
        "multiset never crosses an exchange"),
      "q_profile_mutual_info" -> ("categorical MI (r11): three low-card partial aggregates + " +
        "broadcast joins back — the fact table is scanned for partials only, no window, " +
        "no re-scan"),
      "q_cdc_asof_snapshot" -> ("AS OF snapshot (r8): time cut spelled on the RAW stored ts " +
        "column via Tables.eventsBefore — lands in PushedFilters in EITHER testdata encoding " +
        "(ns-long or µs-NTZ), so a time-partitioned history prunes at the scan"),
      "q_llm_ngram_novelty" -> ("n-gram novelty (r8): first-owner resolution is a shingle-keyed " +
        "group-min joined back on the SAME key (co-partitioned) — hot boilerplate costs one " +
        "partial, never pair volume"),
      "q_profile_fd" -> ("functional-dependency audit (r8): JOINLESS — each candidate pair folds " +
        "to a 1-row verdict through its own partial-agg groupBy, assembled by Union"),
      "q_cdc_churn" -> ("CDC key churn (r8): one partial-agg groupBy on the key + top-50 as " +
        "TakeOrderedAndProject — no window, no global sort"),
      "q_llm_minhash_pr" -> ("LSH quality audit (r8): band-join candidates and shingle-share " +
        "truth each collapse to 1-row counts before meeting — two constant-size folds, no new " +
        "pair join"),
      "q_llm_embed_neardup_ann" -> ("the concrete ANN handoff (r10): 40×5 sign-LSH signatures in " +
        "one fused kernel map, candidates via (table, bucket) EQUI-join self-join — bucket-keyed " +
        "shuffle, never all-pairs — with the exact-cosine rerank INSIDE the join stage so the " +
        "threshold filter prunes map-side and the pair dedup exchanges survivor-sized id rows, " +
        "no embedding payload"),
      "q_agg_approx_distinct_gate" -> ("sketch accuracy gate (r10): HLL partials and exact " +
        "distinct (Expand + 2-phase) computed in the SAME aggregate pass; the tolerance verdict " +
        "is a narrow post-agg projection — the oracle asserts it from the exact side, so the " +
        "sketch's bound is hash-checked without the sketch value crossing engines"),
      "q_llm_embed_neardup_ann_gate" -> ("retrieval accuracy gate (r10): the exact block-pair " +
        "scan and the LSH path meet in ONE full_outer join on (vec_a, vec_b), folded to a 1-row " +
        "integer-exact verdict (hits·100 ≥ n_exact·95, zero extras) — an audit plan that " +
        "deliberately pays both paths; the oracle asserts the verdicts from the exact-pair SQL"),
      "q_llm_dedup_funnel" -> ("dedup waterfall (r11, audited r12): ONE eager-filled widened-corpus " +
        "cache feeds the exact/normalized stage groupBys; the near-dup stage restricts the SHARED " +
        "base-corpus trigram pair relation via two survivor equi-joins before the DedupClusters " +
        "fixpoint; the four stage counts fold through a 4-row window — no stage re-reads text"),
      "q_llm_cluster_medoids" -> ("per-cell medoid curation (r11, audited r12): the SAME Σ cell² " +
        "cell-keyed equi-join bound as semdedup, argmax as ONE order-independent max(struct) " +
        "partial agg (no window over pair rows), singleton cells re-enter via LEFT join so " +
        "output is exactly k rows"),
      "q_llm_coreset_sample" -> ("per-cell coreset prototypes (r11, audited r12): centrality rank " +
        "rides Spark's WindowGroupLimit pushdown — map-side partial top-3 BEFORE the cell " +
        "exchange, so only ≤ 3k rows survive to the final sort at any corpus size"),
      "q_llm_cluster_purity" -> ("quantizer quality eval (r11, audited r12): two low-cardinality " +
        "partial-agg groupBys (k·|labels| groups max) + one broadcast-sized join back — no " +
        "window, no pair work"),
      "q_llm_semdedup_auto" -> ("the grow-k rule EXECUTABLE (r12): k = ⌈n/256⌉ from the parquet " +
        "footer, quantizer trained on the md5-ranked bounded sample, ONE corpus-wide k-row " +
        "broadcast assignment pass, then the same cell-keyed pair join at ~256-row cells — " +
        "within-cell pair work linear in n where the pinned k leaves it quadratic/2k"),
      "q_llm_embed_neardup_pq" -> ("ANN path C (r12): per-subspace codebooks trained on narrow " +
        "(vec_id, sub, subvector) rows, codes packed 8/long so the LSH (t, bucket) candidate " +
        "self-join exchanges 32 B of codes instead of the 256 B embedding payload; the SDC " +
        "filter is the fused PqSdcDot kernel against a ONE-ROW broadcast table (map-side, " +
        "before the pair-dedup shuffle), and full vectors are re-attached by vec_id equi-join " +
        "ONLY for the (θ − margin) survivor band"),
      "q_llm_knn_topk_auto" -> ("retrieval dispatch (r13), exact branch at this corpus size: " +
        "ONE-ROW broadcast of the query vector over the scan (BroadcastNestedLoopJoin with a " +
        "1-row build side is the intended crossJoin shape, not the pair-inflation anti-pattern), " +
        "fused dot kernel, TakeOrderedAndProject top-10 — no shuffle anywhere; past the envelope " +
        "the same id serves from the grow-cells IVF probe join"),
      "q_llm_ann_serve" -> ("oracle-checked ANN serving (r13): the Lloyd-fit stages are the " +
        "audited q_llm_kmeans family; serving adds a k-row BROADCAST centroid rank per query " +
        "(window over ≤ queries·k rows, never corpus-sized), then candidates from a cell " +
        "EQUI-join (probed cells × assignment — nprobe/k of the corpus, no BNLJ, no full scan) " +
        "with the rounded exact rerank riding the prepared norms"))

    val sb = new StringBuilder
    sb.append("# PLANS — final physical plans at sf0.1 (AQE-settled)\n\n")
    sb.append("Generated by `graft.tools.PlanDump` after executing each query —\n")
    sb.append("these are the plans the 100 TB design assumes (SURVEY §4), verified\n")
    sb.append("mechanically in PlanSpec and recorded here for review.\n")
    sb.append(s"Audited: ${picks.size} representative plans of the " +
      s"${graft.SparkEntry.queries.size}-query tree (counts computed at dump " +
      "time — the doc cannot go stale against SparkEntry).\n")
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(4000))
      sb.append("\n```\n")
      graft.CacheScope.drain(blocking = true)
    }

    // Generated coverage table (r14, VERDICT r13 item 1): the SAME
    // PlanGate.facts pass the regression gate asserts in PlanGateSpec,
    // here over every declared id at this SF — the full-surface
    // evidence that no query plans a cartesian, every nested loop is
    // the allowlisted bounded broadcast, and filters reach the scans.
    spark.catalog.clearCache()
    graft.CacheScope.drain(blocking = true)
    sb.append("\n# Generated plan facts — every declared query (PlanGate pass)\n\n")
    sb.append("| id | cartesian | bnlj | inmem | shuffles | unpartwin | scans (pushed-data-filter / partition-filter counts) |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    val ids = graft.SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    ids.foreach { id =>
      val f = try graft.plans.PlanGate.facts(
          graft.SparkEntry.queries(id)(spark, sfDir))
        finally graft.CacheScope.drain(blocking = true)
      val scans = f.scans.map(s =>
        s"${s.relation}(${s.dataFilters.size}/${s.partitionFilters.size})")
        .mkString(", ")
      sb.append(s"| $id | ${f.cartesian} | ${f.bnlj} | ${f.inMemoryScans} " +
        s"| ${f.shuffles} | ${f.unpartWindows} | $scans |\n")
      bad += graft.plans.PlanGate.invariantViolations(id, f).size
    }
    sb.append(s"\nIds audited: ${ids.size}; invariant violations: $bad. " +
      "The committed sf0.001 baseline these facts are asserted against " +
      "lives at src/test/resources/plan_baseline.tsv (regenerate with " +
      "GRAFT_REGEN_PLAN_BASELINE=1 sbt 'testOnly graft.PlanGateSpec').\n")
    Files.writeString(Paths.get(out), sb.toString)
    println(s"PLANDUMP wrote $out (${ids.size} ids, $bad violations)")
    spark.stop()
  }
}

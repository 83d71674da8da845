package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.9 (text analysis slice) — token statistics, tf-idf,
  * language profiling/ID, quality scoring, fingerprinting, token
  * counting. All pure built-in compositions (explode + groupBy for the
  * term-level ops — at 100 TB the explode is a flatMap before a single
  * shuffle on the term key, with map-side partial aggregation).
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** Broadcast gate for vocabulary-sized relations (the df(term) /
    * unigram-LM aggregates). The bound is a CONSERVATIVE HEURISTIC
    * anchored on a real invariant: a distinct-term relation's TEXT
    * cannot serialize larger than the corpus it was extracted from, so
    * when the documents parquet is under `VocabBroadcastMaxBytes` ON
    * DISK (64 MB compressed ⇒ ≲256 MB raw at typical ~4× text codecs)
    * the derived vocab's payload fits an executor with margin. The
    * in-memory broadcast hash relation additionally pays per-row
    * object overhead the on-disk bound doesn't see — on a pathological
    * tiny-term vocabulary that overhead dominates, which is why the
    * gate is set far below the broadcast ceiling rather than at it
    * (ADVICE r5). Above the gate NO hint is emitted and AQE picks
    * broadcast vs shuffle from the aggregate's measured runtime size —
    * on a 100 TB corpus the 10⁸–10⁹-row vocab takes the shuffle path,
    * which costs nothing extra there because the probe side is already
    * term-keyed (VERDICT r3 item 1). The gate reads file-listing
    * metadata only (no job, memoized), so query construction stays
    * lazy. */
  private[graft] val VocabBroadcastMaxBytes = 64L * 1024 * 1024
  private[graft] def gatedVocabHint(vocabRel: DataFrame, corpusBytes: Long): DataFrame =
    if (corpusBytes <= VocabBroadcastMaxBytes) broadcast(vocabRel) else vocabRel
  private def hintIfCorpusSmall(s: SparkSession, d: String, vocabRel: DataFrame): DataFrame =
    gatedVocabHint(vocabRel,
      graft.sources.ParquetMeta.totalBytes(s, s"$d/documents.parquet"))

  /** The corpus word-frequency vocabulary (w, wc) the BPE family
    * trains on — SHARED (r18 optimization): q_llm_bpe_pairs,
    * q_llm_bpe_apply and q_llm_bpe_iter each previously re-collapsed
    * the corpus to its vocabulary per query. Deterministic aggregate,
    * vocabulary-sized (the reason BPE training is feasible at 100 TB),
    * released at corpus boundaries via CacheScope.drainShared. */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    graft.CacheScope.sharedEager(
      Tables.documents(s, d)
        .select(explode(toks(lower(col("text")))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc")))

  /** Corpus unigram LM (term, logp) — SHARED (r19 optimization, guide
    * §2.4/§5): q_llm_unigram_lm and q_llm_ppl_buckets each re-derived
    * the same corpus vocabulary THREE times per invocation (the vocab
    * aggregate, its 1-row total, and the LM projection each re-ran the
    * tokenize/explode corpus pass). The vocab now rides the shared
    * [[bpeVocab]] cache — same explode/groupBy plan, identical counts —
    * and the vocab-sized LM relation is shared across both consumers.
    * logp values are unchanged: round(log(count / total), 6) over the
    * same integer counts. */
  private def corpusLm(s: SparkSession, d: String): DataFrame = {
    val vocab = bpeVocab(s, d)
    val tot = vocab.agg(sum(col("wc")).cast(DoubleType).as("t_total"))
    graft.CacheScope.sharedEager(vocab.crossJoin(broadcast(tot))
      .select(col("w").as("term"),
        round(log(col("wc") / col("t_total")), 6).as("logp")))
  }

  /** Per-term document frequency (term, df) — SHARED (r19, guide
    * §2.4/§5): q_llm_tfidf, q_llm_doc_topterms and
    * q_llm_source_topterms each re-ran the distinct-(doc, term) corpus
    * pass per invocation for the identical vocab-sized relation (and
    * spelled it through slightly different projections, so the
    * CacheManager could never unify them). One helper, one plan, one
    * fill; deterministic counts; released via drainShared. */
  private def termDf(s: SparkSession, d: String): DataFrame =
    graft.CacheScope.sharedEager(
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(lower(col("text")))).as("term"))
        .distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Term frequencies across the corpus, top-20 terms.
    "q_llm_token_stats" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(toks(lower($"text"))).as("term"))
        .groupBy($"term")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term".asc)
        .limit(20)
    }),

    // Zipf rank-frequency fit (r8): OLS slope of ln(freq) on ln(rank)
    // over the whole vocabulary — the one-number corpus health check
    // (natural text sits near −1; templated/generated text drifts
    // shallow). The corpus collapses to the VOCAB after one term
    // shuffle; the rank window runs over that vocab-bounded relation
    // (the PrefixSum-documented bounded top-level window, never over
    // raw tokens), and the fit reduces to five moments. ln() doubles
    // are bit-stable cross-engine (the tfidf/bm25 precedent); products
    // are formed in IEEE double then DECIMAL-summed so merge order
    // can't drift, and the final ratios round(6).
    "q_llm_zipf" -> ((s, d) => {
      import s.implicits._
      import graft.Determinism.sumd
      val v = Tables.documents(s, d)
        .select(explode(toks(lower($"text"))).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
      val ranked = v.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"cnt".desc, $"term".asc)).cast("long"))
      val xy = ranked.select(
        log($"rank".cast(DoubleType)).as("x"),
        log($"cnt".cast(DoubleType)).as("y"))
      xy.select($"x", $"y", ($"x" * $"y").as("xy0"),
          ($"x" * $"x").as("xx0"), ($"y" * $"y").as("yy0"))
        .agg(count(lit(1)).as("n"), sumd($"x").as("sx"), sumd($"y").as("sy"),
          sumd($"xy0").as("sxy"), sumd($"xx0").as("sxx"), sumd($"yy0").as("syy"))
        .select($"n".as("n_terms"),
          round((($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")), 6).as("zipf_slope"),
          round((($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx") / $"n"), 6).as("zipf_intercept"),
          round(pow($"n" * $"sxy" - $"sx" * $"sy", 2) /
            (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")), 6)
            .as("r2"))
    }),

    // tf-idf per (term, doc): tf × ln(N/df). N is a broadcast 1-row
    // aggregate cross-joined into the plan — NOT a driver-side count()
    // (which would fire a full extra scan every time the query is
    // built; VERDICT r1 item 4). The df(term) relation is
    // vocabulary-sized — small here, 10⁸–10⁹ rows on a 100 TB corpus —
    // so its broadcast hint is GATED by hintIfCorpusSmall's provable
    // size bound instead of forced (VERDICT r3 item 1): tiny corpus ⇒
    // hinted (skips the probe-side exchange AQE's late conversion
    // can't avoid), big corpus ⇒ no hint, AQE decides from measured
    // size and the term-keyed shuffle join costs no extra pass. Only
    // n1 keeps an unconditional hint: a global aggregate is exactly
    // 1 row at any corpus size.
    // Per-source characteristic terms (r8): top-10 terms per source by
    // aggregate tf-idf — "what distinguishes each source's text", the
    // corpus-triage view a dataset curator reads before mixing
    // sources. Source-level tf is one (source, term) partial-agg
    // shuffle; df reuses the tfidf spelling; the ranking window runs
    // over the VOCAB-sized (source, term) relation, not the corpus —
    // size-invariant as documents grow. Ranking compares the UNrounded
    // weight (identical doubles both engines, term tie-break makes the
    // order total); round only at output.
    "q_llm_source_topterms" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val n1 = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val terms = docs.select($"source", $"doc_id",
        explode(toks(lower($"text"))).as("term"))
      val stf = terms.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy($"source").orderBy($"weight_raw".desc, $"term")
      stf.join(hintIfCorpusSmall(s, d, termDf(s, d)), "term")
        .crossJoin(broadcast(n1))
        .withColumn("weight_raw", $"tf" * log($"n_docs" / $"df"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter($"rk" <= 10)
        .select($"source", $"rk", $"term", $"tf", $"df",
          round($"weight_raw", 6).as("weight"))
        .orderBy($"source", $"rk")
    }),

    "q_llm_tfidf" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val n1 = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val terms = docs.select($"doc_id", explode(toks(lower($"text"))).as("term"))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      tf.join(hintIfCorpusSmall(s, d, termDf(s, d)), "term")
        .crossJoin(broadcast(n1))
        .select($"doc_id", $"term", $"tf",
          round($"tf" * log($"n_docs" / $"df"), 6).as("tfidf"))
        .orderBy($"doc_id", $"term")
    }),

    // Per-language corpus profile.
    "q_llm_lang_profile" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum($"n_chars").cast(DoubleType) / count(lit(1))).as("avg_chars"),
          countDistinct($"source").as("nd_sources"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
        .orderBy($"lang")
    }),

    // Language-ID heuristic: stopword-list overlap vote with a fixed
    // priority tiebreak (n-gram heuristic per the mandate; the corpus
    // vocabulary is synthetic so the English list dominates by design).
    "q_llm_lang_id" -> ((s, d) => {
      import s.implicits._
      val t = array_distinct(toks(lower($"text")))
      def hits(words: Seq[String]): Column =
        size(array_intersect(t, array(words.map(lit): _*)))
      val en = hits(Seq("the", "a", "of", "and"))
      val es = hits(Seq("el", "la", "de", "y"))
      val de = hits(Seq("der", "die", "das", "und"))
      Tables.documents(s, d)
        .select($"doc_id", $"lang",
          en.cast("long").as("en_hits"), es.cast("long").as("es_hits"), de.cast("long").as("de_hits"),
          when(en >= es && en >= de && en > 0, "en")
            .when(es >= de && es > 0, "es")
            .when(de > 0, "de")
            .otherwise("unknown").as("guessed"))
        .orderBy($"doc_id")
    }),

    // Quality scoring: length/uniqueness/stopword ratios → score.
    "q_llm_quality_score" -> ((s, d) => {
      import s.implicits._
      val tk = toks($"text")
      val nTok = size(tk).cast(DoubleType)
      val nUniq = size(array_distinct(tk)).cast(DoubleType)
      val stop = size(array_intersect(tk, array(lit("the"), lit("a")))).cast(DoubleType)
      val avgTokLen = aggregate(tk, lit(0), (acc, t) => acc + length(t)).cast(DoubleType) / nTok
      Tables.documents(s, d)
        .select($"doc_id",
          size(tk).cast("long").as("n_tokens"),
          (nUniq / nTok).as("uniq_ratio"),
          avgTokLen.as("avg_tok_len"),
          (stop / lit(2.0)).as("stop_cov"),
          (($"n_chars" / lit(553.0)) * 0.3 + (nUniq / nTok) * 0.5 +
            (stop / lit(2.0)) * 0.2).as("quality"))
        .orderBy($"doc_id")
    }),

    // Token counting: whitespace count + regex-token count (BPE-ish).
    "q_llm_token_count" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          size(toks($"text")).cast("long").as("n_ws"),
          size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).cast("long").as("n_alpha"),
          length($"text").cast("long").as("n_chars_m"))
        .orderBy($"doc_id")
    }),

    // Deterministic stratified sampling: md5-hash bucketing, ~10% per
    // language — reproducible on any cluster (no RNG state), the way a
    // training corpus is actually sampled.
    "q_llm_sample_strat" -> ((s, d) => {
      import s.implicits._
      val bucket = conv(substring(md5(concat(lit("sample#"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10
      Tables.documents(s, d)
        .filter(bucket === 0)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Deterministic train/val/test split by hash range (80/10/10):
    // per-(split, lang) doc and char counts.
    "q_llm_split" -> ((s, d) => {
      import s.implicits._
      val h = conv(substring(md5(concat(lit("split#"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10
      Tables.documents(s, d)
        .withColumn("split",
          when(h < 8, "train").when(h === 8, "val").otherwise("test"))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars_total"))
        .orderBy($"split", $"lang")
    }),

    // Eval-contamination check: train docs sharing any trigram shingle
    // with the (simulated) eval set — the semi-join decontamination
    // pass every corpus build runs before training.
    "q_llm_contamination" -> ((s, d) => {
      import s.implicits._
      val sh = Tables.documents(s, d)
        .select($"doc_id", explode(graft.queries.Llm.shingles3Pub(s, $"text")).as("sh"))
      val evalSh = sh.filter($"doc_id" % 97 === 0).select($"sh").distinct()
      val train = sh.filter($"doc_id" % 97 =!= 0)
      train.join(evalSh, Seq("sh"), "left_semi")
        .select($"doc_id").distinct()
        .orderBy($"doc_id")
    }),

    // Edit-distance near-dup over part names — blocked candidate join,
    // never the full cross product. (brand, type) alone is a FIXED
    // domain, so its block sizes grow linearly with data and in-block
    // pairs quadratically (VERDICT r3 item 4); the blocking key
    // therefore also carries a name-length bucket (width 4). That stays
    // EXACT for the ≤3 threshold: lev(a,b) ≤ 3 forces
    // |len(a)−len(b)| ≤ 3, and with width-4 buckets that bounds the
    // bucket distance to 1 — the a-side probes its own and both
    // adjacent buckets via a 3-way explode, so every qualifying pair
    // meets in exactly one (probe, bucket) cell (b's bucket is unique).
    // 3× replication of one side buys blocks that spread across the
    // length distribution instead of pooling per fixed (brand, type).
    "q_llm_edit_distance" -> ((s, d) => {
      import s.implicits._
      val LB = 4
      val p = Tables.part(s, d).select($"p_partkey", $"p_brand", $"p_type", $"p_name",
        floor(length($"p_name") / LB).cast(IntegerType).as("lbkt"))
      val probe = p.withColumn("pbkt",
        explode(array($"lbkt" - 1, $"lbkt", $"lbkt" + 1)))
      probe.as("a").join(p.as("b"),
          $"a.p_brand" === $"b.p_brand" && $"a.p_type" === $"b.p_type" &&
          $"a.pbkt" === $"b.lbkt" &&
          $"a.p_partkey" < $"b.p_partkey" &&
          // free prune: |len(a)−len(b)| > 3 ⟹ lev > 3, skips the
          // O(len²) levenshtein for most in-block pairs — spelled
          // BEFORE the levenshtein conjunct because && short-circuits
          // left-to-right in codegen (r19: the old withColumn+filter
          // spelling pushed the levenshtein predicate to the FRONT of
          // the join condition, so every in-block candidate paid the
          // banded DP and the cheap prunes ran after it, dead)
          abs(length($"a.p_name") - length($"b.p_name")) <= 3 &&
          // threshold form bounds the DP band to O(len·3) per pair and
          // returns -1 past the bound — same surviving rows/values as
          // the unbounded distance filtered to <=3, at a fraction of
          // the CPU; survivors re-evaluate it once in the projection.
          // Measured at sf0.1: the old order ran the DP on all ~2.66M
          // hash-matched rows (before the partkey residual); this order
          // runs it on 1.29M + 84k survivor re-evals
          levenshtein($"a.p_name", $"b.p_name", 3) =!= -1)
        .select($"a.p_partkey".as("part_a"), $"b.p_partkey".as("part_b"),
          levenshtein($"a.p_name", $"b.p_name", 3).cast("long").as("lev"))
        .orderBy($"part_a", $"part_b")
    }),

    // Tokenizer-training primitive: the first BPE merge step — count
    // adjacent symbol (char) pairs across the corpus weighted by word
    // frequency, emit the top candidates. Shape: the word-frequency
    // aggregate collapses the corpus to its vocabulary FIRST (tiny at
    // any scale — this is why BPE training is feasible at 100 TB), so
    // the char-pair explode runs over distinct words only. (r3)
    "q_llm_bpe_pairs" -> ((s, d) => {
      import s.implicits._
      val words = bpeVocab(s, d)
      val pairs = words.select($"wc", explode(
        when(length($"w") >= 2, transform(sequence(lit(1), length($"w") - 1),
          i => concat($"w".substr(i, lit(1)), $"w".substr(i + 1, lit(1)))))
          // guard: Spark sequence(1, 0) REVERSES instead of emptying
          .otherwise(array().cast(ArrayType(StringType)))).as("pair"))
      pairs.groupBy($"pair").agg(sum($"wc").as("cnt"))
        .orderBy($"cnt".desc, $"pair".asc)
        .limit(20)
    }),

    // BPE merge APPLICATION (r7) — the step that closes the tokenizer-
    // training loop bpe_pairs opened: pick the winning adjacent pair,
    // merge it greedily left-to-right in every vocabulary word
    // (literal `replace` — the standard BPE non-overlapping scan), and
    // recount adjacent TOKEN pairs over the re-segmented vocabulary
    // (= BPE iteration 2's input). Everything distributed stays
    // vocabulary-sized: the corpus collapses to (word, count) first,
    // the winner is a 1-row broadcast, the merge is a narrow map —
    // iterating k merges is k such passes with only the 1-row winner
    // crossing the driver boundary.
    "q_llm_bpe_apply" -> ((s, d) => {
      import s.implicits._
      val words = bpeVocab(s, d)
      val pairs = words.select($"wc", explode(
        when(length($"w") >= 2, transform(sequence(lit(1), length($"w") - 1),
          i => concat($"w".substr(i, lit(1)), $"w".substr(i + 1, lit(1)))))
          .otherwise(array().cast(ArrayType(StringType)))).as("pair"))
        .groupBy($"pair").agg(sum($"wc").as("cnt"))
      val top1 = pairs.orderBy($"cnt".desc, $"pair".asc).limit(1)
        .select($"pair".as("mp"))
      val merged = words.crossJoin(broadcast(top1))
        .withColumn("w2", expr("replace(w, mp, chr(1))"))
      def tokAt(i: Column) = {
        val ch = $"w2".substr(i, lit(1))
        when(ch === expr("chr(1)"), $"mp").otherwise(ch)
      }
      merged.select($"wc", explode(
        when(length($"w2") >= 2, transform(sequence(lit(1), length($"w2") - 1),
          i => concat(tokAt(i), tokAt(i + 1))))
          .otherwise(array().cast(ArrayType(StringType)))).as("pair"))
        .groupBy($"pair").agg(sum($"wc").as("cnt"))
        .orderBy($"cnt".desc, $"pair".asc)
        .limit(20)
    }),

    // ITERATED BPE training (r8) — k=3 merge rounds of the loop
    // bpe_pairs/bpe_apply opened, as ONE dataflow (no driver collect:
    // each round's winner is a 1-row broadcast relation). State after
    // round k is the vocabulary re-segmented with merges 1..k, words
    // spelled with sentinel chars chr(1..k); pairs are counted in
    // TOKEN space — keyed by the 2-sentinel-char window `pair_s`
    // (what `replace` consumes next round) and displayed in expanded
    // spelling `pair_e` (chr(k) mapped back through the winner chain).
    // Output: for each round, the top-20 adjacent-token-pair counts
    // AFTER that round's merge — round 1 is definitionally
    // q_llm_bpe_apply's output (pinned in ContractSpec). Scale shape:
    // the corpus collapses to (word, wc) ONCE; every later relation is
    // vocabulary- or pair-vocabulary-sized, so k rounds cost k tiny
    // shuffles — the reason BPE training is feasible at 100 TB. The
    // reused vocab/pair relations are CacheScope-local (drained by the
    // harness after materialization).
    "q_llm_bpe_iter" -> ((s, d) => {
      import s.implicits._
      val pairT = ArrayType(StructType(Seq(
        StructField("pair_s", StringType), StructField("pair_e", StringType))))
      val words0 = bpeVocab(s, d)
      // sentinel char chr(k) -> the merged token's expanded spelling
      def tokAt(w: Column, i: Column, exps: Seq[(Int, Column)]): Column = {
        val ch = w.substr(i, lit(1))
        exps.foldRight(ch) { case ((k, e), acc) =>
          when(ch === expr(s"chr($k)"), e).otherwise(acc) }
      }
      def pairCounts(df: DataFrame, wCol: String, exps: Seq[(Int, Column)]): DataFrame = {
        val w = col(wCol)
        df.select($"wc", explode(
            when(length(w) >= 2, transform(sequence(lit(1), length(w) - 1),
              i => struct(w.substr(i, lit(2)).as("pair_s"),
                concat(tokAt(w, i, exps), tokAt(w, i + 1, exps)).as("pair_e"))))
              // guard: Spark sequence(1, 0) REVERSES instead of emptying
              .otherwise(array().cast(pairT))).as("p"))
          .select($"wc", $"p.pair_s".as("pair_s"), $"p.pair_e".as("pair_e"))
          .groupBy($"pair_s", $"pair_e").agg(sum($"wc").as("cnt"))
      }
      // winner = most frequent TOKEN pair (pair_s determines pair_e, so
      // grouping by both = grouping by pair_s); expanded-then-sentinel
      // tiebreak is total
      def win(pc: DataFrame, sA: String, eA: String): DataFrame =
        pc.orderBy($"cnt".desc, $"pair_e".asc, $"pair_s".asc).limit(1)
          .select($"pair_s".as(sA), $"pair_e".as(eA))
      // r19 note: EAGER per-round caches (localEager on pc0/pc1/pc2 —
      // VERDICT r18 next-item 8's "fold the merge tables" direction)
      // were built and MEASURED SLOWER: four serialized fill jobs cost
      // 1.2–1.5 s of construction vs ~1.2 s for the whole lazy action,
      // because within the ONE final action Spark's ReuseExchange +
      // lazy cache fills already dedupe the round relations while
      // overlapping their stages on idle cores. The lazy marks stay;
      // OPTIMIZATION_r19.md carries the numbers.
      val pc0 = pairCounts(words0, "w", Nil)
      val words1 = words0.crossJoin(broadcast(win(pc0, "p1s", "p1e")))
        .withColumn("w1", expr("replace(w, p1s, chr(1))"))
      val pc1 = graft.CacheScope.local(pairCounts(words1, "w1", Seq(1 -> $"p1e")))
      val words2 = words1.crossJoin(broadcast(win(pc1, "p2s", "p2e")))
        .withColumn("w2", expr("replace(w1, p2s, chr(2))"))
      val pc2 = graft.CacheScope.local(
        pairCounts(words2, "w2", Seq(1 -> $"p1e", 2 -> $"p2e")))
      val words3 = words2.crossJoin(broadcast(win(pc2, "p3s", "p3e")))
        .withColumn("w3", expr("replace(w2, p3s, chr(3))"))
      val pc3 = pairCounts(words3, "w3",
        Seq(1 -> $"p1e", 2 -> $"p2e", 3 -> $"p3e"))
      // display: collapse to expanded spelling (matches bpe_apply's
      // grouping; distinct token pairs sharing a spelling sum)
      def recount(pc: DataFrame, step: Int): DataFrame =
        pc.groupBy($"pair_e").agg(sum($"cnt").as("cnt"))
          .orderBy($"cnt".desc, $"pair_e".asc).limit(20)
          .select(lit(step).cast(LongType).as("step"), $"pair_e".as("pair"), $"cnt")
      recount(pc1, 1).unionByName(recount(pc2, 2)).unionByName(recount(pc3, 3))
        .orderBy($"step", $"cnt".desc, $"pair")
    }),

    // Context-window chunking: split each doc into overlapping
    // fixed-token windows (window=32, stride=24) — the sequence-length
    // preprocessing step between cleaning and tokenization. Narrow
    // per-row explode (each row yields ceil(n/stride) chunks), no
    // shuffle before the output sort; chunk identity is (doc_id,
    // chunk_id) and the content hash makes chunks joinable/dedupable
    // downstream. (r3)
    "q_llm_window_chunks" -> ((s, d) => {
      import s.implicits._
      val W = 32
      val S = 24
      Tables.documents(s, d)
        .select($"doc_id", toks($"text").as("tk"))
        .select($"doc_id", $"tk",
          explode(sequence(lit(1), size($"tk"), lit(S))).as("st"))
        .select($"doc_id",
          (($"st" - 1) / S).cast(LongType).as("chunk_id"),
          size(slice($"tk", $"st", lit(W))).cast(LongType).as("n_tok"),
          md5(concat_ws(" ", slice($"tk", $"st", lit(W)))).as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Per-doc cross-entropy under the corpus unigram LM (nats/token) —
    // the cheap perplexity-style quality filter. The LM is the
    // term-count aggregate — vocabulary-sized, so its broadcast hint is
    // GATED by hintIfCorpusSmall's provable size bound (VERDICT r3
    // item 1): on a 100 TB corpus the 10⁸–10⁹-row vocab takes the
    // un-hinted path and AQE picks broadcast vs shuffle from the LM's
    // measured runtime size; the tf side is term-keyed either way.
    // Only `tot` keeps an unconditional hint — a global aggregate is
    // exactly 1 row at any scale. Log-probs are rounded
    // to 6dp per term, the per-doc sum runs through the DECIMAL(38,6)
    // exact-sum discipline (order-independent under AQE). Two linear
    // shuffles on term / (doc_id, term) — scales. (r3)
    "q_llm_unigram_lm" -> ((s, d) => {
      import s.implicits._
      val terms = Tables.documents(s, d)
        .select($"doc_id", explode(toks(lower($"text"))).as("term"))
      // LM from the shared corpus vocab (r19) — was a second and third
      // corpus tokenize pass per invocation
      terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .join(hintIfCorpusSmall(s, d, corpusLm(s, d)), "term")
        .groupBy($"doc_id")
        .agg(
          sum($"tf").cast(LongType).as("n_tok"),
          round(-(sum(graft.Determinism.dec($"logp" * $"tf")).cast(DoubleType)) /
            sum($"tf"), 6).as("xent_nats"))
        .orderBy($"doc_id")
    }),

    // Repetition quality signals (the Gopher-rule family): duplicate
    // trigram fraction + top-bigram share per doc. The n-gram counts
    // are per-row narrow ops; the top-bigram share is two partial-agg
    // shuffles on (doc_id[, bigram]) — linear in corpus, no self-join.
    // Ratios are raw IEEE divisions of integer counts (bit-identical
    // across engines — the repo's determinism discipline). (r3)
    "q_llm_repetition" -> ((s, d) => {
      import s.implicits._
      val tk = toks($"text")
      val n = size(tk)
      val tri = when(n >= 3, transform(sequence(lit(1), n - 2), i =>
        concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))
        .otherwise(array().cast(ArrayType(StringType)))
      val base = Tables.documents(s, d).select($"doc_id",
        size(tri).cast(LongType).as("n_tri"),
        when(size(tri) > 0,
          lit(1.0) - size(array_distinct(tri)).cast(DoubleType) / size(tri))
          .otherwise(lit(0.0)).as("dup_tri_frac"))
      val bg = Tables.documents(s, d).select($"doc_id",
          explode(when(n >= 2, transform(sequence(lit(1), n - 1), i =>
            concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
            .otherwise(array().cast(ArrayType(StringType)))).as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg((max($"c").cast(DoubleType) / sum($"c")).as("top_bigram_share"))
      base.join(bg, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tri", $"dup_tri_frac",
          coalesce($"top_bigram_share", lit(0.0)).as("top_bigram_share"))
        .orderBy($"doc_id")
    }),

    // PII scrub: mask digit runs and emit the audit columns a
    // compliance pipeline needs (what was masked, how much survived).
    // Narrow map over the scan — no shuffle, codegen regex; patterns
    // are swappable (digits here; SSN/phone/email shapes are the same
    // operator with different regexes). (r3 addition)
    "q_llm_pii_mask" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d).select(
        $"c_custkey",
        regexp_replace($"c_name", "[0-9]+", "<NUM>").as("masked_name"),
        size(regexp_extract_all($"c_name", lit("[0-9]+"), lit(0))).cast(LongType).as("n_digit_runs"),
        length(regexp_replace($"c_name", "[0-9]", "")).cast(LongType).as("n_clear_chars"))
        .orderBy($"c_custkey")
    }),

    // Span-level exact dedup (r8): every 8-token sliding span that
    // repeats ACROSS documents — the span-granularity member of the
    // dedup family (document-level exact/near dedup can't see a
    // boilerplate paragraph pasted into otherwise-distinct documents;
    // span dedup is how training corpora catch it). Shape: a narrow
    // per-row explode (~n_tok spans/doc) + ONE span-hash-keyed
    // partial-agg shuffle — the count/countDistinct partials combine
    // map-side, so the hottest boilerplate span costs its partials,
    // not its row volume. Only the md5 (16 B) shuffles, never span
    // text.
    "q_llm_span_dedup" -> ((s, d) => {
      import s.implicits._
      val W = 8
      Tables.documents(s, d)
        .select($"doc_id", toks($"text").as("tk"))
        .select($"doc_id", $"tk", explode(
          when(size($"tk") >= W, sequence(lit(1), size($"tk") - (W - 1)))
            .otherwise(array().cast(ArrayType(IntegerType)))).as("st"))
        .select($"doc_id", md5(concat_ws(" ", slice($"tk", $"st", lit(W)))).as("span_hash"))
        // two-level aggregate instead of countDistinct (r19, guide
        // §2.3): the single-aggregate spelling planned through Expand —
        // every span row REPLICATED before the shuffle so the distinct
        // and plain counts could ride one pass. Aggregating by
        // (span_hash, doc_id) first then rolling up to span_hash ships
        // each span partial once; n_docs = count of per-doc rows,
        // n_spans = sum of per-doc counts — identical values. Measured
        // 2.5× on the cold pass at sf0.1 (2.64 → 1.05 s), equal warm.
        .groupBy($"span_hash", $"doc_id").agg(count(lit(1)).as("c"))
        .groupBy($"span_hash")
        .agg(count(lit(1)).as("n_docs"), sum($"c").as("n_spans"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .filter($"n_docs" >= 2)
        .orderBy($"span_hash")
    }),

    // Document fingerprint: md5 over the sorted distinct token set
    // (order-insensitive content identity).
    "q_llm_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          md5(concat_ws(" ", sort_array(array_distinct(toks($"text"))))).as("fingerprint"),
          size(array_distinct(toks($"text"))).cast("long").as("n_uniq"))
        .orderBy($"doc_id")
    }),

    // BM25 ranked retrieval (r8): the query-side complement of
    // q_llm_tfidf — score every document against a fixed 4-term query
    // (Lucene-variant IDF, k1=1.2, b=0.75), return the top 100. Scale
    // shape: the term explode filters to the QUERY terms before the
    // doc_id groupBy (the shuffle carries only hit partials); df and
    // corpus stats are 1-row broadcasts; top-k plans as
    // TakeOrderedAndProject (per-partition partial top-k — no global
    // sort shuffle, no global window). Per-term score parts are summed
    // in FIXED query order so float addition is bit-identical across
    // engines; rank ties break on round-6 score then doc_id.
    "q_llm_bm25" -> ((s, d) => {
      import s.implicits._
      val qTerms = Seq("dup", "spark", "batch", "window")
      val docs = Tables.documents(s, d)
      val dl = docs.select($"doc_id", size(toks(lower($"text"))).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
        (sum($"dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
      val hits = docs.select($"doc_id", explode(toks(lower($"text"))).as("term"))
        .filter($"term".isin(qTerms: _*))
      val tfAggs = qTerms.map(t =>
        sum(when($"term" === t, 1L).otherwise(0L)).as(s"tf_$t"))
      val tf = hits.groupBy($"doc_id").agg(tfAggs.head, tfAggs.tail: _*)
      val dfAggs = qTerms.map(t =>
        sum(when($"term" === t, 1L).otherwise(0L)).as(s"df_$t"))
      val dfw = hits.select($"doc_id", $"term").distinct()
        .agg(dfAggs.head, dfAggs.tail: _*)
      val norm = lit(1.0) - lit(0.75) + lit(0.75) * $"dl" / $"avgdl"
      val score = qTerms.map { t =>
        log(($"n_docs" - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1.0)) *
          (col(s"tf_$t") * lit(2.2)) / (col(s"tf_$t") + lit(1.2) * norm)
      }.reduce(_ + _)
      tf.join(dl, "doc_id")
        .crossJoin(broadcast(dfw))
        .crossJoin(broadcast(stats))
        .select($"doc_id", round(score, 6).as("bm25"))
        .orderBy($"bm25".desc, $"doc_id")
        .limit(100)
    }),

    // Bigram language model (r8): corpus-wide conditional next-token
    // probabilities P(w2|w1) = c(w1,w2) / c(w1,·), top-30 bigrams —
    // the n=2 step from q_llm_unigram_lm toward the n-gram LM family
    // (perplexity filtering, domain detection). The bigram expansion
    // is a NARROW per-row transform (no posexplode+self-join: each
    // doc's token array zips with its own tail in place), then two
    // partial-agg shuffles — (w1,w2) counts, and w1 margins over the
    // already-collapsed vocab²-bounded pair relation; the margin
    // relation is vocab-sized so the corpus-size broadcast gate
    // applies. Counts stay integer until one IEEE division; top-30 is
    // a total-ordered TakeOrderedAndProject, never a full sort.
    "q_llm_bigram_lm" -> ((s, d) => {
      import s.implicits._
      val bi = Tables.documents(s, d)
        .select(toks(lower($"text")).as("tk"))
        .filter(size($"tk") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("b"))
        .select($"b.w1".as("w1"), $"b.w2".as("w2"))
      val pairCnt = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n_pair"))
      // w1 margin as a WINDOW over the pair relation, not a self-join
      // (r19 optimization, VERDICT r18 next-item 4 / guide §2.4): the
      // join spelling re-derived pairCnt's whole lineage on the margin
      // side — two documents.parquet scans + two tokenize/explode
      // passes for one relation. The window re-partitions the already
      // vocab²-bounded pair counts by w1 (one extra tiny exchange) and
      // sums the SAME integer n_pair values the join summed, so
      // n_w1/cond_p are bit-identical; corpus cost drops to one scan.
      pairCnt
        .withColumn("n_w1", sum($"n_pair").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"w1")))
        .select($"w1", $"w2", $"n_pair", $"n_w1",
          round($"n_pair".cast(DoubleType) / $"n_w1".cast(DoubleType), 6).as("cond_p"))
        .orderBy($"n_pair".desc, $"w1", $"w2")
        .limit(30)
    }),

    // Quality-filter report (r8): the per-document RULE LEDGER a
    // training pipeline keeps alongside its kept/dropped decision
    // (Gopher-style heuristics) — not just a score (q_llm_quality_score)
    // but WHICH rule fired, so filter regressions are diffable and
    // rules are tunable per corpus. All four rules are narrow per-row
    // expressions over the text column — no shuffle at all, the whole
    // report is a single codegen'd projection at any scale. Thresholds
    // are corpus-calibrated (words 10–99, mean word length 3.7–5.3
    // here) so every rule actually fires. Comparisons sit on exact
    // IEEE ratios of integer lengths — identical in both engines.
    "q_llm_filter_report" -> ((s, d) => {
      import s.implicits._
      val tk = toks($"text")
      val nWords = size(tk).cast(LongType)
      val meanLen = length(regexp_replace($"text", " ", "")).cast(DoubleType) /
        size(tk).cast(DoubleType)
      val uniqRatio = size(array_distinct(tk)).cast(DoubleType) /
        size(tk).cast(DoubleType)
      Tables.documents(s, d)
        .select($"doc_id", nWords.as("n_words"),
          round(meanLen, 6).as("mean_word_len"),
          round(uniqRatio, 6).as("uniq_ratio"),
          (nWords < 20L).as("flag_short"),
          (nWords > 80L).as("flag_long"),
          (meanLen < 3.8 || meanLen > 5.2).as("flag_word_len"),
          (uniqRatio < 0.5).as("flag_repetitive"))
        .withColumn("kept",
          !($"flag_short" || $"flag_long" || $"flag_word_len" || $"flag_repetitive"))
        .orderBy($"doc_id")
    }),

    // Per-document top TF-IDF terms (r8): the keyword-extraction twin
    // of q_llm_source_topterms at document granularity — what a
    // retrieval index or topic labeler stores per doc. Same scale
    // shape as q_llm_tfidf (two partial-agg shuffles to tf/df, vocab
    // relation behind the corpus-size broadcast gate); the top-3 is a
    // per-doc row_number over each doc's OWN terms — the window
    // partitions by doc_id, so no global relation is ever sorted.
    // Ranking orders by the RAW weight (ties broken by term) — both
    // engines compute the same IEEE product, and rounding happens
    // after selection, the q_llm_source_topterms discipline.
    "q_llm_doc_topterms" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val n1 = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val terms = docs.select($"doc_id", explode(toks(lower($"text"))).as("term"))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      tf.join(hintIfCorpusSmall(s, d, termDf(s, d)), "term")
        .crossJoin(broadcast(n1))
        .withColumn("w_raw", $"tf" * log($"n_docs" / $"df"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"w_raw".desc, $"term".asc))
          .cast(LongType))
        .filter($"rk" <= 3)
        .select($"doc_id", $"rk", $"term", $"tf", $"df",
          round($"w_raw", 6).as("weight"))
        .orderBy($"doc_id", $"rk")
    }),

    // N-gram novelty curve (r8): per document, the share of its
    // distinct trigram shingles appearing for the FIRST time in
    // doc_id order — the data-curation signal for "is the tail of
    // this corpus still contributing new content or just recombining
    // old n-grams" (dedup thresholds and stop-crawling decisions hang
    // off it). Shape: shingle explode (the q_llm_contamination
    // kernel), a shingle-keyed partial-agg min(doc_id) for first
    // owners, one equi-join back on the shingle key (both sides
    // arrive partitioned by shingle — co-located), then a per-doc
    // fold. No pair join: ownership is a group-min, so the hottest
    // boilerplate shingle costs one partial, not its pair volume.
    "q_llm_ngram_novelty" -> ((s, d) => {
      import s.implicits._
      // ride the SHARED shingle relation (r19): `sh` is consumed twice
      // (first-owner aggregate + the join probe), so the per-row
      // shingle kernel ran over the corpus twice per invocation while
      // the ngram-dedup family already kept the identical distinct-set
      // relation cached (triShingles ≡ shingles3Pub, ShingleSpec; the
      // size>0 filter only drops docs whose empty arrays explode to
      // nothing anyway)
      val sh = graft.CacheScope.shared(graft.queries.Llm.shingledPub(s, d))
        .select($"doc_id", explode($"shingles").as("sh"))
      val first = sh.groupBy($"sh").agg(min($"doc_id").as("first_doc"))
      sh.join(first, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when($"first_doc" === $"doc_id", 1)).as("n_novel"))
        .withColumn("novelty",
          round($"n_novel".cast(DoubleType) / $"n_shingles".cast(DoubleType), 6))
        .orderBy($"doc_id")
    }),

    // Heaps-law vocabulary growth (r8): one row per document that
    // INTRODUCED vocabulary — new-type count + the cumulative curve —
    // the diminishing-returns view a crawl-budget decision reads
    // (sub-linear growth = healthy natural text; a persistently
    // linear curve means templated/noisy tail; this synthetic corpus
    // saturates its 31-word vocabulary by doc 8, which the curve
    // shows directly). First-occurrence is a term-keyed partial-agg
    // min (one vocab-sized shuffle — the corpus never pairs with
    // itself); after groupBy(first_doc) the relation is ≤|vocab|
    // rows, so the cumulative window is vocab-bounded (the
    // source_topterms documented exception), never corpus-sized.
    "q_llm_vocab_growth" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select($"doc_id", explode(toks(lower($"text"))).as("term"))
        .groupBy($"term").agg(min($"doc_id").as("first_doc"))
        .groupBy($"first_doc").agg(count(lit(1)).as("new_terms"))
        .withColumn("vocab_size", sum($"new_terms").over(
          Window.orderBy($"first_doc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"first_doc", $"new_terms", $"vocab_size")
        .orderBy($"first_doc")
    }),

    // CCNet-style perplexity bucketing (r9): score every doc against
    // the corpus unigram LM (the q_llm_unigram_lm cross-entropy),
    // then split each SOURCE into four equal-count buckets by score —
    // the head/middle/tail partition CCNet uses to keep the
    // lowest-perplexity slice per domain. Scale: the LM is the
    // vocab-bounded relation under the corpus-size broadcast gate; the
    // ntile window runs over DOCS per source (one shuffle on source),
    // and the output collapses to |sources|×4 rows. Determinism: xent
    // is the unigram_lm discipline (decimal-summed, rounded at 6), and
    // the bucket order (xent, doc_id) is total, so ntile membership is
    // identical in both engines.
    "q_llm_ppl_buckets" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val terms = Tables.documents(s, d)
        .select($"doc_id", $"source", explode(toks(lower($"text"))).as("term"))
      // LM from the shared corpus vocab (r19) — was a second and third
      // corpus tokenize pass per invocation
      val xent = terms.groupBy($"doc_id", $"source", $"term").agg(count(lit(1)).as("tf"))
        .join(hintIfCorpusSmall(s, d, corpusLm(s, d)), "term")
        .groupBy($"doc_id", $"source")
        .agg(round(-(sum(graft.Determinism.dec($"logp" * $"tf")).cast(DoubleType)) /
          sum($"tf"), 6).as("xent"))
      xent.withColumn("bucket",
          ntile(4).over(Window.partitionBy($"source").orderBy($"xent", $"doc_id"))
            .cast("long"))
        .groupBy($"source", $"bucket")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(graft.Determinism.dec($"xent")).cast(DoubleType) /
            count(lit(1)), 6).as("mean_xent"),
          min($"xent").as("min_xent"), max($"xent").as("max_xent"))
        .orderBy($"source", $"bucket")
    }),

    // Per-doc character-level entropy (r9): the compression-proxy
    // quality signal (low entropy ⇒ repetitive/templated text, high ⇒
    // random noise; natural prose sits ~4 bits/char) the Gopher-rule
    // family reads next to token repetition. Scale: the char explode
    // is a narrow per-row flatMap (≤n_chars rows per doc) into ONE
    // (doc, char) partial-agg shuffle — same linear shape as the token
    // ops. Determinism: p = n/tot is an exact integer division, the
    // per-char −p·log2 p terms go through DECIMAL, one final round.
    "q_llm_char_entropy" -> ((s, d) => {
      import s.implicits._
      val cc = Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", "")).as("c"))
        .filter(length($"c") > 0)
        .groupBy($"doc_id", $"c").agg(count(lit(1)).as("n"))
      val t = cc.groupBy($"doc_id")
        .agg(sum($"n").as("tot"), count(lit(1)).as("n_distinct"))
      val p = $"n".cast(DoubleType) / $"tot"
      cc.join(t, "doc_id")
        .groupBy($"doc_id")
        .agg(max($"n_distinct").cast("long").as("n_chars_distinct"),
          round(sum(graft.Determinism.dec(-p * log(2.0, p))).cast(DoubleType), 6)
            .as("char_entropy"))
        .orderBy($"doc_id")
    }),

    // Data-mixture design (r9): per-source temperature-weighted
    // sampling weights — the table a training run is configured from.
    // w_i ∝ tokens_i^0.5 (α = 0.5 upweights small sources the way
    // multilingual/multi-domain mixes do), plus effective epochs per
    // source at a fixed 1M-token budget (epochs > 1 = that source
    // repeats — the memorization-risk flag). Scale: ONE partial-agg
    // groupBy collapses the corpus to |sources| rows; the weight
    // normalizer is a one-row broadcast. Determinism: sqrt of an exact
    // integer is correctly-rounded IEEE in both engines, the raw
    // weight goes through DECIMAL (exact normalizer sum), and each
    // share/epoch is division-then-round.
    // Heavy hitters via a mergeable Misra–Gries Aggregator (r9): which
    // tokens exceed 1/64 of the corpus — the frequent-items scan that
    // at 100 TB must NOT shuffle the full token domain. Two passes:
    // (1) the MG sketch (graft.functions.HeavyHitters, a typed
    // Aggregator UDAF with constant ≤64-entry partials) folds each
    // partition locally and merges through Spark's partial-agg
    // machinery — the shuffle carries at most 64 counters per
    // partition no matter how large the vocabulary; the MG superset
    // guarantee (undercount ≤ n/(k+1)) means every token with true
    // freq > n/64 survives in the candidate map. (2) the ≤64
    // candidates broadcast back as a semi-join filter and ONLY they
    // are recounted exactly. The sketch's estimates are merge-order-
    // dependent; the OUTPUT (exact counts, integer threshold
    // cnt·64 > n) is deterministic — the sketch prunes, never decides.
    "q_llm_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val terms = Tables.documents(s, d)
        .select(explode(toks(lower($"text"))).as("term"))
      // The total count folds INTO the sketch pass (r9 advice), so the
      // corpus is tokenized exactly twice — sketch+count, then the
      // candidate recount — not three times. The 1-row sketch result is
      // cached because it feeds two subtrees (candidates + total);
      // `terms` itself is deliberately NOT persisted — an exploded
      // token relation is corpus-sized, and re-scanning the pruned
      // parquet beats spilling it at 100 TB.
      // (eager — the candidate and total broadcast builds both scan
      // it concurrently; a lazy fill would tokenize the corpus twice)
      val sketch = graft.CacheScope.localEager(terms
        .agg(graft.functions.HeavyHitters.mgSketch(64)($"term").as("mg"),
          count(lit(1)).as("n")))
      val cand = sketch.select(explode(map_keys($"mg")).as("term"))
      val tot = broadcast(sketch.select($"n"))
      terms.join(broadcast(cand), "term")
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .crossJoin(tot)
        .filter($"cnt" * 64 > $"n")
        .select($"term", $"cnt")
        .orderBy($"cnt".desc, $"term")
    }),

    "q_llm_mix_weights" -> ((s, d) => {
      import s.implicits._
      val perSrc = Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
        .withColumn("w_raw", graft.Determinism.dec(sqrt($"n_tokens".cast(DoubleType))))
      val tot = broadcast(perSrc.agg(sum($"w_raw").as("w_tot")))
      val share = $"w_raw".cast(DoubleType) / $"w_tot".cast(DoubleType)
      perSrc.crossJoin(tot)
        .select($"source", $"n_docs", $"n_tokens",
          round(share, 6).as("mix_weight"),
          round(lit(1000000.0) * share / $"n_tokens", 6).as("epochs"))
        .orderBy($"source")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_llm_token_stats" ->
      ("WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents) " +
       "SELECT term, COUNT(*) AS cnt FROM t GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 20"),
    "q_llm_zipf" ->
      ("WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "g AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term), " +
       "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rnk FROM g), " +
       "xy AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM r), " +
       "m AS (SELECT COUNT(*) AS n, " +
       "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
       "CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy, " +
       "CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy, " +
       "CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx, " +
       "CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy FROM xy) " +
       "SELECT n AS n_terms, " +
       "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope, " +
       "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS zipf_intercept, " +
       "round(pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2 " +
       "FROM m"),
    "q_llm_source_topterms" ->
      ("WITH terms AS (SELECT source, doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "stf AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY source, term), " +
       "df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term), " +
       "n AS (SELECT COUNT(*) AS n FROM documents), " +
       "j AS (SELECT source, stf.term AS term, tf, df, " +
       "tf * ln(CAST(n AS DOUBLE) / df) AS weight_raw FROM stf " +
       "JOIN df ON stf.term = df.term CROSS JOIN n), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY source " +
       "ORDER BY weight_raw DESC, term) AS rk FROM j) " +
       "SELECT source, rk, term, tf, df, round(weight_raw, 6) AS weight " +
       "FROM r WHERE rk <= 10 ORDER BY source, rk"),
    "q_llm_tfidf" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term), " +
       "df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term), " +
       "n AS (SELECT COUNT(*) AS n FROM documents) " +
       "SELECT doc_id, tf.term AS term, tf, " +
       "round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf " +
       "FROM tf JOIN df ON tf.term = df.term CROSS JOIN n ORDER BY doc_id, term"),
    "q_llm_lang_profile" ->
      ("SELECT lang, COUNT(*) AS n_docs, " +
       "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars, " +
       "COUNT(DISTINCT source) AS nd_sources, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars " +
       "FROM documents GROUP BY lang ORDER BY lang"),
    "q_llm_lang_id" ->
      ("WITH t AS (SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS tk FROM documents), " +
       "h AS (SELECT doc_id, lang, " +
       "len(list_intersect(tk, ['the','a','of','and'])) AS en_hits, " +
       "len(list_intersect(tk, ['el','la','de','y'])) AS es_hits, " +
       "len(list_intersect(tk, ['der','die','das','und'])) AS de_hits FROM t) " +
       "SELECT doc_id, lang, en_hits, es_hits, de_hits, " +
       "CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en' " +
       "WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es' " +
       "WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS guessed " +
       "FROM h ORDER BY doc_id"),
    "q_llm_quality_score" ->
      ("WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents), " +
       "m AS (SELECT doc_id, n_chars, len(tk) AS n_tokens, " +
       "CAST(len(list_distinct(tk)) AS DOUBLE) AS n_uniq, CAST(len(tk) AS DOUBLE) AS n_tok, " +
       "CAST(len(list_intersect(tk, ['the','a'])) AS DOUBLE) AS stop, " +
       "CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk) AS avg_tok_len FROM t) " +
       "SELECT doc_id, n_tokens, n_uniq / n_tok AS uniq_ratio, avg_tok_len, " +
       "stop / 2.0 AS stop_cov, " +
       "(n_chars / 553.0) * 0.3 + (n_uniq / n_tok) * 0.5 + (stop / 2.0) * 0.2 AS quality " +
       "FROM m ORDER BY doc_id"),
    "q_llm_token_count" ->
      ("SELECT doc_id, len(string_split(text, ' ')) AS n_ws, " +
       "len(regexp_extract_all(text, '[a-z]+')) AS n_alpha, " +
       "length(text) AS n_chars_m FROM documents ORDER BY doc_id"),
    "q_llm_sample_strat" ->
      ("SELECT doc_id, lang, source, n_chars FROM documents " +
       "WHERE CAST(('0x' || substr(md5('sample#' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0 " +
       "ORDER BY doc_id"),
    "q_llm_split" ->
      ("WITH h AS (SELECT doc_id, lang, n_chars, " +
       "CAST(('0x' || substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b FROM documents), " +
       "sp AS (SELECT lang, n_chars, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split FROM h) " +
       "SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total " +
       "FROM sp GROUP BY split, lang ORDER BY split, lang"),
    "q_llm_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), sh0 AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)]) AS shingles FROM t), ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh0 WHERE len(shingles) > 0), ev AS (SELECT DISTINCT sh FROM ex WHERE doc_id % 97 = 0), tr AS (SELECT doc_id, sh FROM ex WHERE doc_id % 97 <> 0) SELECT DISTINCT doc_id FROM tr WHERE sh IN (SELECT sh FROM ev) ORDER BY doc_id""",
    "q_llm_edit_distance" ->
      ("SELECT a.p_partkey AS part_a, b.p_partkey AS part_b, " +
       "levenshtein(a.p_name, b.p_name) AS lev " +
       "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_type = b.p_type " +
       "AND a.p_partkey < b.p_partkey " +
       "WHERE levenshtein(a.p_name, b.p_name) <= 3 ORDER BY part_a, part_b"),
    "q_llm_bpe_pairs" ->
      ("WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
       "wf AS (SELECT w, COUNT(*) AS wc FROM w GROUP BY w), " +
       "p AS (SELECT wc, unnest(CASE WHEN length(w) >= 2 THEN " +
       "[substring(w, i, 1) || substring(w, i + 1, 1) for i in range(1, length(w))] " +
       "ELSE [] END) AS pair FROM wf) " +
       "SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt FROM p GROUP BY pair " +
       "ORDER BY cnt DESC, pair ASC LIMIT 20"),
    "q_llm_bpe_apply" ->
      ("WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
       "wf AS (SELECT w, COUNT(*) AS wc FROM w GROUP BY w), " +
       "p AS (SELECT wc, unnest(CASE WHEN length(w) >= 2 THEN " +
       "[substring(w, i, 1) || substring(w, i + 1, 1) for i in range(1, length(w))] " +
       "ELSE [] END) AS pair FROM wf), " +
       "pc AS (SELECT pair, SUM(wc) AS cnt FROM p GROUP BY pair), " +
       "top1 AS (SELECT pair AS mp FROM pc ORDER BY cnt DESC, pair ASC LIMIT 1), " +
       "m AS (SELECT wc, mp, replace(w, mp, chr(1)) AS w2 FROM wf CROSS JOIN top1), " +
       "np AS (SELECT wc, unnest(CASE WHEN length(w2) >= 2 THEN " +
       "[(CASE WHEN substring(w2, i, 1) = chr(1) THEN mp ELSE substring(w2, i, 1) END) || " +
       "(CASE WHEN substring(w2, i + 1, 1) = chr(1) THEN mp ELSE substring(w2, i + 1, 1) END) " +
       "for i in range(1, length(w2))] ELSE [] END) AS pair FROM m) " +
       "SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt FROM np GROUP BY pair " +
       "ORDER BY cnt DESC, pair ASC LIMIT 20"),
    "q_llm_bpe_iter" ->
      ("WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
       "wf AS (SELECT w AS w0, COUNT(*) AS wc FROM w GROUP BY w), " +
       // round 1: char-pair counts, winner, merge (sentinel chr(1))
       "p0 AS (SELECT wc, unnest(CASE WHEN length(w0) >= 2 THEN " +
       "[substring(w0, i, 2) for i in range(1, length(w0))] ELSE [] END) AS ps FROM wf), " +
       "pc0 AS (SELECT ps AS pair_s, ps AS pair_e, SUM(wc) AS cnt FROM p0 GROUP BY ps), " +
       "win1 AS (SELECT pair_s AS p1s, pair_e AS p1e FROM pc0 " +
       "ORDER BY cnt DESC, pair_e ASC, pair_s ASC LIMIT 1), " +
       "m1 AS (SELECT wc, p1s, p1e, replace(w0, p1s, chr(1)) AS w1 FROM wf CROSS JOIN win1), " +
       "p1 AS (SELECT wc, unnest(CASE WHEN length(w1) >= 2 THEN " +
       "[{'ps': substring(w1, i, 2), " +
       "'pe': (CASE WHEN substring(w1, i, 1) = chr(1) THEN p1e ELSE substring(w1, i, 1) END) || " +
       "(CASE WHEN substring(w1, i + 1, 1) = chr(1) THEN p1e ELSE substring(w1, i + 1, 1) END)} " +
       "for i in range(1, length(w1))] ELSE [] END) AS p FROM m1), " +
       "pc1 AS (SELECT p.ps AS pair_s, p.pe AS pair_e, SUM(wc) AS cnt FROM p1 GROUP BY 1, 2), " +
       // round 2
       "win2 AS (SELECT pair_s AS p2s, pair_e AS p2e FROM pc1 " +
       "ORDER BY cnt DESC, pair_e ASC, pair_s ASC LIMIT 1), " +
       "m2 AS (SELECT m1.*, p2s, p2e, replace(w1, p2s, chr(2)) AS w2 FROM m1 CROSS JOIN win2), " +
       "p2 AS (SELECT wc, unnest(CASE WHEN length(w2) >= 2 THEN " +
       "[{'ps': substring(w2, i, 2), " +
       "'pe': (CASE WHEN substring(w2, i, 1) = chr(1) THEN p1e " +
       "WHEN substring(w2, i, 1) = chr(2) THEN p2e ELSE substring(w2, i, 1) END) || " +
       "(CASE WHEN substring(w2, i + 1, 1) = chr(1) THEN p1e " +
       "WHEN substring(w2, i + 1, 1) = chr(2) THEN p2e ELSE substring(w2, i + 1, 1) END)} " +
       "for i in range(1, length(w2))] ELSE [] END) AS p FROM m2), " +
       "pc2 AS (SELECT p.ps AS pair_s, p.pe AS pair_e, SUM(wc) AS cnt FROM p2 GROUP BY 1, 2), " +
       // round 3
       "win3 AS (SELECT pair_s AS p3s, pair_e AS p3e FROM pc2 " +
       "ORDER BY cnt DESC, pair_e ASC, pair_s ASC LIMIT 1), " +
       "m3 AS (SELECT m2.*, p3s, p3e, replace(w2, p3s, chr(3)) AS w3 FROM m2 CROSS JOIN win3), " +
       "p3 AS (SELECT wc, unnest(CASE WHEN length(w3) >= 2 THEN " +
       "[{'ps': substring(w3, i, 2), " +
       "'pe': (CASE WHEN substring(w3, i, 1) = chr(1) THEN p1e " +
       "WHEN substring(w3, i, 1) = chr(2) THEN p2e " +
       "WHEN substring(w3, i, 1) = chr(3) THEN p3e ELSE substring(w3, i, 1) END) || " +
       "(CASE WHEN substring(w3, i + 1, 1) = chr(1) THEN p1e " +
       "WHEN substring(w3, i + 1, 1) = chr(2) THEN p2e " +
       "WHEN substring(w3, i + 1, 1) = chr(3) THEN p3e ELSE substring(w3, i + 1, 1) END)} " +
       "for i in range(1, length(w3))] ELSE [] END) AS p FROM m3), " +
       "pc3 AS (SELECT p.ps AS pair_s, p.pe AS pair_e, SUM(wc) AS cnt FROM p3 GROUP BY 1, 2), " +
       // per-round displays: collapse to expanded spelling, top-20
       "r1 AS (SELECT CAST(1 AS BIGINT) AS step, pair_e AS pair, CAST(SUM(cnt) AS BIGINT) AS cnt " +
       "FROM pc1 GROUP BY pair_e ORDER BY cnt DESC, pair ASC LIMIT 20), " +
       "r2 AS (SELECT CAST(2 AS BIGINT) AS step, pair_e AS pair, CAST(SUM(cnt) AS BIGINT) AS cnt " +
       "FROM pc2 GROUP BY pair_e ORDER BY cnt DESC, pair ASC LIMIT 20), " +
       "r3 AS (SELECT CAST(3 AS BIGINT) AS step, pair_e AS pair, CAST(SUM(cnt) AS BIGINT) AS cnt " +
       "FROM pc3 GROUP BY pair_e ORDER BY cnt DESC, pair ASC LIMIT 20) " +
       "SELECT step, pair, cnt FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2 " +
       "UNION ALL SELECT * FROM r3) ORDER BY step, cnt DESC, pair"),
    "q_llm_window_chunks" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
       "c AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 24)) AS st FROM t) " +
       "SELECT doc_id, CAST((st - 1) // 24 AS BIGINT) AS chunk_id, " +
       "CAST(len(tk[st:st+31]) AS BIGINT) AS n_tok, " +
       "md5(array_to_string(tk[st:st+31], ' ')) AS chunk_hash " +
       "FROM c ORDER BY doc_id, chunk_id"),
    "q_llm_unigram_lm" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "v AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term), " +
       "tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t_total FROM v), " +
       "lm AS (SELECT term, round(ln(cnt / t_total), 6) AS logp FROM v CROSS JOIN tot), " +
       "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term) " +
       "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok, " +
       "round(-CAST(SUM(CAST(logp * tf AS DECIMAL(38,6))) AS DOUBLE) / SUM(tf), 6) AS xent_nats " +
       "FROM tf JOIN lm ON tf.term = lm.term GROUP BY doc_id ORDER BY doc_id"),
    "q_llm_repetition" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
       "g AS (SELECT doc_id, " +
       "CASE WHEN len(tk) >= 3 THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] " +
       "for i in range(1, len(tk) - 1)] ELSE [] END AS tri, " +
       "CASE WHEN len(tk) >= 2 THEN [tk[i] || ' ' || tk[i+1] " +
       "for i in range(1, len(tk))] ELSE [] END AS bi FROM t), " +
       "base AS (SELECT doc_id, CAST(len(tri) AS BIGINT) AS n_tri, " +
       "CASE WHEN len(tri) > 0 THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri) " +
       "ELSE 0.0 END AS dup_tri_frac FROM g), " +
       "bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM (SELECT doc_id, unnest(bi) AS bg FROM g) GROUP BY doc_id, bg), " +
       "tb AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_share FROM bgc GROUP BY doc_id) " +
       "SELECT base.doc_id, n_tri, dup_tri_frac, COALESCE(top_bigram_share, 0.0) AS top_bigram_share " +
       "FROM base LEFT JOIN tb ON tb.doc_id = base.doc_id ORDER BY base.doc_id"),
    "q_llm_pii_mask" ->
      ("SELECT c_custkey, regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS masked_name, " +
       "CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_digit_runs, " +
       "CAST(length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_clear_chars " +
       "FROM customer ORDER BY c_custkey"),
    "q_llm_span_dedup" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
       "c AS (SELECT doc_id, tk, unnest(CASE WHEN len(tk) >= 8 THEN range(1, len(tk) - 6) " +
       "ELSE [] END) AS st FROM t), " +
       "h AS (SELECT doc_id, md5(array_to_string(tk[st:st+7], ' ')) AS span_hash FROM c) " +
       "SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_spans, " +
       "MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc " +
       "FROM h GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY span_hash"),
    "q_llm_fingerprint" ->
      ("SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint, " +
       "len(list_distinct(string_split(text, ' '))) AS n_uniq FROM documents ORDER BY doc_id"),
    "q_llm_bm25" -> {
      val qTerms = Seq("dup", "spark", "batch", "window")
      val inList = qTerms.map(t => s"'$t'").mkString(", ")
      val tfCols = qTerms.map(t =>
        s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(", ")
      val dfCols = qTerms.map(t =>
        s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
      val scoreSql = qTerms.map(t =>
        s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * (tf_$t * 2.2) / " +
          s"(tf_$t + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      "WITH dl AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS dl FROM documents), " +
        "st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl), " +
        "hits AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
        s"ft AS (SELECT doc_id, term FROM hits WHERE term IN ($inList)), " +
        s"tf AS (SELECT doc_id, $tfCols FROM ft GROUP BY doc_id), " +
        s"dfw AS (SELECT $dfCols FROM (SELECT DISTINCT doc_id, term FROM ft)), " +
        "j AS (SELECT tf.*, dl.dl, dfw.*, st.* FROM tf " +
        "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN dfw CROSS JOIN st) " +
        s"SELECT doc_id, round($scoreSql, 6) AS bm25 FROM j " +
        "ORDER BY bm25 DESC, doc_id LIMIT 100"
    },
    "q_llm_bigram_lm" ->
      ("WITH t AS (SELECT string_split(lower(text), ' ') AS tk FROM documents), " +
       "b AS (SELECT unnest([struct_pack(w1 := tk[i], w2 := tk[i + 1]) " +
       "for i in range(1, len(tk))]) AS bg FROM t WHERE len(tk) >= 2), " +
       "p AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS n_pair FROM b GROUP BY 1, 2), " +
       "sc AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_w1 FROM p GROUP BY w1) " +
       "SELECT p.w1, w2, n_pair, n_w1, " +
       "round(CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE), 6) AS cond_p " +
       "FROM p JOIN sc ON p.w1 = sc.w1 " +
       "ORDER BY n_pair DESC, p.w1, w2 LIMIT 30"),
    "q_llm_filter_report" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
       "CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mwl, " +
       "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ur " +
       "FROM documents) " +
       "SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len, round(ur, 6) AS uniq_ratio, " +
       "n_words < 20 AS flag_short, n_words > 80 AS flag_long, " +
       "(mwl < 3.8 OR mwl > 5.2) AS flag_word_len, ur < 0.5 AS flag_repetitive, " +
       "NOT (n_words < 20 OR n_words > 80 OR mwl < 3.8 OR mwl > 5.2 OR ur < 0.5) AS kept " +
       "FROM t ORDER BY doc_id"),
    "q_llm_doc_topterms" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term), " +
       "df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term), " +
       "n AS (SELECT COUNT(*) AS n FROM documents), " +
       "j AS (SELECT doc_id, tf.term AS term, tf, df, " +
       "tf * ln(CAST(n AS DOUBLE) / df) AS w_raw FROM tf " +
       "JOIN df ON tf.term = df.term CROSS JOIN n), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
       "ORDER BY w_raw DESC, term) AS rk FROM j) " +
       "SELECT doc_id, rk, term, tf, df, round(w_raw, 6) AS weight " +
       "FROM r WHERE rk <= 3 ORDER BY doc_id, rk"),
    "q_llm_ngram_novelty" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
       "sh0 AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] " +
       "for i in range(1, len(toks) - 1)]) AS shingles FROM t), " +
       "ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh0 WHERE len(shingles) > 0), " +
       "f AS (SELECT sh, MIN(doc_id) AS first_doc FROM ex GROUP BY sh) " +
       "SELECT ex.doc_id, COUNT(*) AS n_shingles, " +
       "COUNT(CASE WHEN first_doc = ex.doc_id THEN 1 END) AS n_novel, " +
       "round(CAST(COUNT(CASE WHEN first_doc = ex.doc_id THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS novelty " +
       "FROM ex JOIN f ON ex.sh = f.sh GROUP BY ex.doc_id ORDER BY ex.doc_id"),
    "q_llm_vocab_growth" ->
      ("WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "f AS (SELECT term, MIN(doc_id) AS first_doc FROM t GROUP BY term), " +
       "b AS (SELECT first_doc, COUNT(*) AS new_terms FROM f GROUP BY first_doc) " +
       "SELECT first_doc, new_terms, " +
       "CAST(SUM(new_terms) OVER (ORDER BY first_doc ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size " +
       "FROM b ORDER BY first_doc"),
    "q_llm_ppl_buckets" ->
      ("WITH terms AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "v AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term), " +
       "tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t_total FROM v), " +
       "lm AS (SELECT term, round(ln(cnt / t_total), 6) AS logp FROM v CROSS JOIN tot), " +
       "tf AS (SELECT doc_id, source, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, source, term), " +
       "x AS (SELECT doc_id, source, " +
       "round(-CAST(SUM(CAST(logp * tf AS DECIMAL(38,6))) AS DOUBLE) / SUM(tf), 6) AS xent " +
       "FROM tf JOIN lm ON tf.term = lm.term GROUP BY doc_id, source), " +
       "b AS (SELECT source, xent, NTILE(4) OVER (PARTITION BY source ORDER BY xent, doc_id) AS bucket FROM x) " +
       "SELECT source, bucket, COUNT(*) AS n_docs, " +
       "round(CAST(SUM(CAST(xent AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS mean_xent, " +
       "min(xent) AS min_xent, max(xent) AS max_xent " +
       "FROM b GROUP BY source, bucket ORDER BY source, bucket"),
    "q_llm_char_entropy" ->
      ("WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents), " +
       "cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c), " +
       "t AS (SELECT doc_id, SUM(n) AS tot, COUNT(*) AS n_distinct FROM cc GROUP BY doc_id) " +
       "SELECT cc.doc_id, CAST(max(n_distinct) AS BIGINT) AS n_chars_distinct, " +
       "round(CAST(SUM(CAST(-(CAST(n AS DOUBLE)/tot) * log2(CAST(n AS DOUBLE)/tot) AS DECIMAL(38,6))) AS DOUBLE), 6) AS char_entropy " +
       "FROM cc JOIN t ON cc.doc_id = t.doc_id GROUP BY cc.doc_id ORDER BY cc.doc_id"),
    "q_llm_heavy_hitters" ->
      ("WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
       "n AS (SELECT COUNT(*) AS n FROM t) " +
       "SELECT term, COUNT(*) AS cnt FROM t GROUP BY term " +
       "HAVING COUNT(*) * 64 > (SELECT n FROM n) " +
       "ORDER BY cnt DESC, term"),
    "q_llm_mix_weights" ->
      ("WITH s AS (SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
       "FROM documents GROUP BY source), " +
       "w AS (SELECT source, n_docs, n_tokens, " +
       "CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,6)) AS w_raw FROM s), " +
       "t AS (SELECT CAST(SUM(w_raw) AS DOUBLE) AS w_tot FROM w) " +
       "SELECT source, n_docs, n_tokens, " +
       "round(CAST(w_raw AS DOUBLE) / w_tot, 6) AS mix_weight, " +
       "round(1000000.0 * (CAST(w_raw AS DOUBLE) / w_tot) / n_tokens, 6) AS epochs " +
       "FROM w CROSS JOIN t ORDER BY source")
  )
}

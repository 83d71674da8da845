package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup cluster resolution: connected components over the pair
  * graph, canonical member = min doc id. This is the step a dedup
  * pipeline ends with — pairs alone don't say which docs to keep.
  *
  * Implementation: min-label propagation WITH pointer jumping, iterated
  * to a fixpoint with a driver-side loop. Each round does (a) the
  * neighbor step — every node takes the min of its own and its
  * neighbors' labels — and (b) the jump step — every node then follows
  * its label's own label (path halving). (a) alone needs
  * O(graph diameter) rounds, which a chain-shaped component turns into
  * O(n); (b) halves every label path per round, so rounds are
  * O(log diameter) (VERDICT r3 item 5 — a 200-node chain converges in
  * ≤10 rounds). Fully deterministic → hash-checkable against a
  * recursive-CTE oracle.
  */
object DedupClusters {

  /** pairs(doc_a, doc_b) → (doc_id, canonical) for every doc appearing
    * in at least one pair; canonical = min id in the component.
    * `edgesPerPartition` sizes the iteration (default keeps partitions
    * ~100k edges; tests lower it to exercise the distributed
    * propagation path on small graphs). */
  def resolve(spark: SparkSession, pairs: DataFrame,
      edgesPerPartition: Long = 100000L): DataFrame =
    resolveWithRounds(spark, pairs, edgesPerPartition)._1

  /** As [[resolve]], additionally returning the number of propagation
    * rounds taken (0 on the single-partition union-find path) — the
    * observability hook that lets tests pin the O(log diameter) round
    * bound instead of trusting it. `maxRounds` is the loud-failure
    * bound; with path halving, 50 covers diameters beyond any physical
    * graph (2^50), so hitting it means a logic bug, not a big input. */
  private[graft] def resolveWithRounds(spark: SparkSession, pairs: DataFrame,
      edgesPerPartition: Long = 100000L, maxRounds: Int = 50): (DataFrame, Int) = {
    // Materialize the candidate-pair derivation ONCE (it may be an
    // expensive upstream join), then size the iteration to the graph:
    // the near-dup edge list is orders of magnitude smaller than the
    // corpus, so the loop runs on few partitions — 1 here for the
    // hundreds-of-edges case; at larger graphs raise it to keep
    // partitions ~edgesPerPartition edges each.
    val p = graft.CacheScope.shared(pairs)
    val nEdges = p.count()
    val parts = math.max(1, (nEdges / edgesPerPartition).toInt)
    // Union-find consumes undirected pairs directly — no symmetric
    // union, no distinct (duplicates are harmless), one less shuffle.
    if (parts == 1)
      return (resolveLocal(spark,
        p.select(col("doc_a").as("src"), col("doc_b").as("dst")).repartition(1)), 0)
    val edges = graft.CacheScope.shared(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct().repartition(parts))
    // localCheckpoint (not cache) per round: the next round's plan
    // references the previous labels THREE times, so without lineage
    // truncation the logical plan grows exponentially with rounds and
    // analysis OOMs long before the round bound (found by the
    // propagation-path test; any many-round graph at scale hits it).
    // Tradeoff: localCheckpoint forfeits lineage-based recovery — an
    // executor loss mid-iteration fails the job (rerun) instead of
    // recomputing; a cluster deployment that can't accept that swaps
    // in reliable checkpoint(). Standard iterative-graph practice.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lab", col("doc_id")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      // neighbor step: each node takes min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst_id"),
          col("dst") === col("dst_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("lab")).as("nlab"))
      val stepped = labels.join(viaNeighbors, "doc_id")
        .select(col("doc_id"), least(col("lab"), col("nlab")).as("lab"))
      // jump step (path halving): follow the label's own label. Labels
      // are monotone — lab(x) ≤ x always — so lab(lab(x)) ≤ lab(x) and
      // one jump halves every label path; this is what turns the round
      // count from O(diameter) into O(log diameter). One extra
      // label-keyed shuffle per round buys exponentially fewer rounds.
      val next = stepped.as("s")
        .join(stepped.select(col("doc_id").as("j_id"), col("lab").as("j_lab")).as("j"),
          col("s.lab") === col("j_id"))
        .select(col("s.doc_id").as("doc_id"), col("j_lab").as("lab"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("lab", "old"), "doc_id")
        .filter(col("lab") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    // A silent exit with changed > 0 would return wrong canonical labels
    // (the round bound was hit before the fixpoint) — fail loudly instead.
    if (changed > 0)
      throw new IllegalStateException(
        s"DedupClusters: min-label propagation did not converge in $rounds rounds " +
        s"($changed labels still changing) — pair-graph diameter exceeds the bound")
    (labels.select(col("doc_id"), col("lab").as("canonical")), rounds)
  }

  /** Single-partition case: classic union-find in one executor pass
    * (same result as the iterative path — the "min id becomes root"
    * union rule makes the final root the component minimum). */
  private def resolveLocal(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    edges.as[(Long, Long)].mapPartitions { it =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
          parent.getOrElseUpdate(math.min(ra, rb), math.min(ra, rb))
        } else parent.getOrElseUpdate(ra, ra)
      }
      // Materialize the member snapshot BEFORE emitting: find() still
      // path-compresses (mutates the map), and interleaving that mutation
      // with a lazy keySet-VIEW iterator silently dropped rows (observed:
      // 39 of 47 members emitted, dependent on shuffle-fetch edge order —
      // deep parent chains only form under some arrival orders). An array
      // snapshot of the keys decouples mutation from consumption; the
      // (member → component-min) result itself is arrival-order-invariant.
      parent.keysIterator.toArray.map(x => (x, find(x))).iterator
    }.toDF("doc_id", "canonical")
  }
}

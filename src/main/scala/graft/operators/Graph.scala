package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the missing
  * piece between pairwise near-dup detection and an actual dedup
  * decision: similarity is not transitive, but "is a duplicate of"
  * must be, so the pair graph has to be resolved into components
  * before survivors can be chosen.
  *
  * Min-label propagation: every vertex starts labelled with itself;
  * each round it adopts the smallest label among itself and its
  * neighbors; converged when no label changes. Rounds = the graph
  * diameter — near-dup clusters are shallow (pairs/chains of a few
  * docs), so 2-4 rounds in practice; `maxIter` guards adversarial
  * chains. Each round is one shuffle join + aggregate, fully
  * distributed; the driver only evaluates the has-anything-changed
  * count (the standard iterate-until-fixpoint pattern — GraphX/Pregel
  * does exactly this underneath). For web-scale graphs with large
  * diameters the two-phase star-contraction variant (Kiveris et al.,
  * "Connected Components in MapReduce", SoCC'14) drops rounds to
  * O(log n); the per-round dataflow here is the same shape.
  */
object Graph {

  /** Target edge rows per shuffle partition inside the CC iteration
    * loops. Label propagation's per-round frames are |E|/|V|-sized
    * two-long rows, so a million rows is ~16 MB of shuffle per task —
    * small enough to never pressure memory, large enough that a
    * near-dup pair graph (thousands of edges at bench SFs) runs its
    * rounds in ONE task instead of `spark.sql.shuffle.partitions`
    * (r17, guide §2.2/§2.5: an iteration over a tiny graph paid 32
    * partitions × ~6 exchanges × rounds of pure task-scheduling
    * overhead — measured 4-5 s of the 6.6/7.1 s dedup_clusters walls
    * at sf0.1 with the pair build itself under 2 s).
    */
  private[graft] val CcRowsPerPartition: Long = 1000000L

  /** Shuffle-partition count for the iteration rounds, derived from
    * the MEASURED edge count: ceil(edges / [[CcRowsPerPartition]]),
    * clamped to [1, spark.sql.shuffle.partitions]. The session conf
    * stays the ceiling — a cluster-sized conf keeps cluster-sized
    * parallelism for graphs that need it; the derive only removes
    * overhead the row count proves unnecessary. Scale-adaptive, not
    * local-tuned: any cluster wants 1-task rounds on a 10⁴-row graph.
    */
  private[graft] def deriveCcPartitions(spark: org.apache.spark.sql.SparkSession,
      edgeRows: Long): Int = {
    val conf = spark.sessionState.conf.numShufflePartitions.toLong
    math.max(1L, math.min(conf,
      (edgeRows + CcRowsPerPartition - 1) / CcRowsPerPartition)).toInt
  }

  /** Run `body` with spark.sql.shuffle.partitions temporarily set to
    * `n`, restoring the previous value afterwards. Only the EAGER jobs
    * inside the iteration loops run under the override (each round
    * materializes via count/localCheckpoint); the lazy result frame
    * plans downstream under the caller's conf.
    */
  private def withShufflePartitions[A](spark: org.apache.spark.sql.SparkSession,
      n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Release the blocks behind a SUPERSEDED iteration frame: the plan
    * cache (if cached) plus any `localCheckpoint` RDD blocks — which
    * neither `Dataset.unpersist` nor `catalog.clearCache` reclaims, so
    * without this every round's |V|/|E|-sized blocks linger in executor
    * storage until GC finds the RDD. Only safe once the successor
    * round is materialized (the eager checkpoint/count above each call
    * guarantees nothing still reads these blocks).
    */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** @param edges two long columns (`src`, `dst`); undirected, self
    *              loops ignored.
    * @param checkpointEvery truncate plan lineage with a
    *              `localCheckpoint` every this many rounds. `.cache()`
    *              alone only SHORTCUTS the lineage — an evicted cache
    *              block under memory pressure silently recomputes the
    *              whole iteration chain from round 0, which on a
    *              large-diameter graph is quadratic work. The
    *              checkpoint makes the cut durable: recomputation can
    *              never reach past the last checkpoint.
    * @return (id, label) — label is the component's minimum vertex id.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          checkpointEvery: Int = 4): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = fwd
      .unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    // materialize (and count) the edge set under the CALLER's conf —
    // the upstream pair-detector chain wants full parallelism — then
    // run the iteration rounds at the partition count the edge count
    // derives (see deriveCcPartitions)
    val spark = edges.sparkSession
    val nParts = deriveCcPartitions(spark, sym.count())
    withShufflePartitions(spark, nParts) {
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = false
    var iter = 0
    // the newest LIVE checkpoint: cached rounds between checkpoints
    // recompute from it if evicted, so its blocks may only be released
    // once the NEXT checkpoint is materialized (localCheckpoint blocks
    // are unrecoverable — releasing one that a cached round's
    // recompute path still needs would fail the job, not slow it)
    var lastCp: DataFrame = null
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nl")).as("nbr_label"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // cache every round (intra-round reuse); every checkpointEvery-th
      // round ALSO cut the lineage durably — localCheckpoint (executor
      // block store) rather than a distributed checkpoint dir: the
      // labels table is |V| rows, and losing an executor just restarts
      // the job, same blast radius as losing its shuffle files
      val isCp = checkpointEvery > 0 && (iter + 1) % checkpointEvery == 0
      val updated = if (isCp) next.localCheckpoint() else next.cache()
      // the count() both materializes the new labels (cutting the
      // iteration lineage at the cache) and decides convergence
      val changed = updated
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels.unpersist()
      if (isCp) {
        // this round's lineage is cut: every round the previous
        // checkpoint backed is dead, its blocks can finally go
        if (lastCp != null) release(lastCp)
        lastCp = updated
      }
      labels = updated
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    // returning labels of a non-converged run would silently split
    // true components (each fragment electing its own keeper) — fail
    // loudly instead; callers with deeper graphs raise maxIter or
    // switch to star-contraction
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds " +
      "(component diameter exceeds maxIter)")
    labels
    }
  }

  /** Two-phase star-contraction connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): the
    * large-diameter scale path. [[connectedComponents]]'s min-label
    * propagation needs O(diameter) rounds — fine for shallow near-dup
    * clusters, hopeless on a 10⁶-hop adversarial chain. Alternating
    * large-star / small-star contractions converge in O(log n) rounds
    * REGARDLESS of diameter, with the same per-round dataflow shape
    * (one groupBy-min + one join, fully distributed, nothing on the
    * driver).
    *
    *  - large-star(u): attach every neighbor v > u to
    *    m = min(Γ(u) ∪ u) — hooks big nodes onto local minima;
    *  - small-star(u): attach every neighbor v ≤ u (and u) to m —
    *    flattens the resulting trees.
    *
    * Fixpoint: every component is a star centered at its minimum id,
    * at which point both phases are identity. Labels read directly
    * off the final edge set. StarContractionSpec proves partition
    * equality with the min-label path on chains, cliques, and the
    * corpus pair graph, and that a 64-node chain converges in ≤ 10
    * rounds (vs 63 for propagation).
    *
    * @return (id, label) — label is the component's minimum vertex id;
    *         same contract as [[connectedComponents]].
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 30): DataFrame =
    starWithRounds(edges, maxIter)._1

  /** [[connectedComponentsStar]] plus the number of rounds it took —
    * the O(log n) claim is spec-asserted, not just cited.
    *
    * Each round ends in an EAGER `localCheckpoint`, unconditionally —
    * unlike the propagation loop (one plan branch per round, cut every
    * few rounds), each star round references the previous pair set ~6
    * times (two symmetrizations, two hooks, the convergence
    * anti-joins), so an uncut logical plan grows ~6× PER ROUND and
    * canonicalization OOMs the driver near round 10 (observed). The
    * checkpoint rebases every round on a LogicalRDD: constant-size
    * plans, constant per-round cost.
    */
  private[graft] def starWithRounds(edges: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    val input = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    val nodes = input.select(col("a").as("id"))
      .unionAll(input.select(col("b").as("id"))).distinct().cache()
    // input is an eager localCheckpoint (built under the caller's
    // conf); the rounds run at the edge-count-derived partition count
    val spark = edges.sparkSession
    val nParts = deriveCcPartitions(spark, input.count())
    withShufflePartitions(spark, nParts) {
    var pairs = input
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: center u over BOTH directions; m = min(Γ(u) ∪ u).
      // Emit (v, m) for v > u, plus the (u, m) hook itself. m ≤ u < v
      // keeps every emitted pair canonical (small, large).
      val sym = pairs.select(col("a").as("u"), col("b").as("v"))
        .unionAll(pairs.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionAll(mins.filter(col("m") =!= col("u"))
          .select(col("m").as("a"), col("u").as("b")))
        .distinct()
      // SMALL-STAR: center each pair at its LARGER endpoint (every
      // canonical pair (a,b) contributes v=a to center u=b); emit
      // (v, m) for v ≠ m plus (u, m). m < u always, v < u always.
      val ssIn = ls.select(col("b").as("u"), col("a").as("v"))
      val mins2 = ssIn.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ssJ = ssIn.join(mins2, Seq("u"))
      val next = ssJ.filter(col("v") =!= col("m"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .unionAll(mins2.select(col("m").as("a"), col("u").as("b")))
        .distinct()
      val updated = next.localCheckpoint()
      // converged ⇔ the canonical pair set is a fixpoint of both stars
      val changed = updated.join(pairs, Seq("a", "b"), "left_anti")
        .unionAll(pairs.join(updated, Seq("a", "b"), "left_anti"))
        .limit(1).count()
      // superseded round's checkpoint blocks are dead now that
      // `updated` is materialized — but never release `input`: its
      // blocks still back the `nodes` cache the returned plan reads
      if (!(pairs eq input)) release(pairs)
      pairs = updated
      converged = changed == 0
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxIter rounds")
    // fixpoint edges are (component-min, member) stars: member → min,
    // centers label themselves
    // input's checkpoint blocks back `nodes`, which the returned plan
    // still reads — do not unpersist here
    val labels = pairs.select(col("b").as("id"), col("a").as("label"))
    val out = nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    (out, iter)
    }
  }
}

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
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = false
    var iter = 0
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
      val updated =
        if (checkpointEvery > 0 && (iter + 1) % checkpointEvery == 0) next.localCheckpoint()
        else next.cache()
      // the count() both materializes the new labels (cutting the
      // iteration lineage at the cache) and decides convergence
      val changed = updated
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels.unpersist()
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

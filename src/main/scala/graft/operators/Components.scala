package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup pair graph — the
  * dedup-cluster step a production pipeline runs after pair generation
  * (pairs → components → keep ONE representative doc per component).
  * Reference capability class: A1/A8 composition (SURVEY.md §2.4); no
  * counterpart in the reference's sequential code, required at corpus
  * scale where dup groups span many pairs.
  *
  * Algorithm: min-label propagation. Each iteration propagates the
  * minimum component label across edges with ONE shuffle join + ONE
  * aggregation; rounds needed = O(max component diameter), tiny for
  * near-dup graphs (dup clusters are dense quasi-cliques, diameter 1-2).
  * Labels and edges are eager localCheckpoints so per-iteration lineage
  * stays flat (no exponential replay) and the loop exits on a converged
  * change-count. At extreme scale swap the rule for large-star/
  * small-star (same join shape, O(log n) rounds on pathological
  * chains); the operator contract is unchanged. */
object Components {

  /** pairs: (doc_a, doc_b) undirected edges. Returns (doc_id,
    * cluster_id) for every endpoint, where cluster_id is the minimum
    * doc_id of the connected component — i.e. the component's canonical
    * representative (the doc a keep-one-per-cluster dedup retains). */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint()
    var converged = false
    while (!converged) {
      val nbrMin = edges.join(labels, col("src") === col("doc_id"))
        .groupBy(col("dst")).agg(min(col("cluster_id")).as("nbr_min"))
      // carry the old label through the step so convergence is a filter
      // over the materialized round, not an extra old⨝new shuffle join
      val stepped = labels
        .join(nbrMin, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), col("cluster_id").as("old_label"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val changes = stepped.filter(col("cluster_id") =!= col("old_label")).count()
      labels = stepped.select(col("doc_id"), col("cluster_id"))
      converged = changes == 0
    }
    labels
  }
}

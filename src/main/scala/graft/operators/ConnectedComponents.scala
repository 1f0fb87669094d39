package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the transitive
  * closure a corpus dedup actually needs: near-dup PAIRS are edges, and
  * the keep-one-per-duplicate-CLUSTER policy is "keep the minimum id of
  * each component" (pairwise keep-first over-drops chains: a doc whose
  * only match has a larger id still belongs to a cluster whose canonical
  * representative is elsewhere — cf. the reference's pairwise delete,
  * vector_db has no transitive grouping at all).
  *
  * Algorithm: hash-min label propagation (the standard MapReduce/Pregel
  * CC baseline): every node starts labeled with its own id; each round a
  * node's label becomes the min of its own and its neighbors' labels.
  * Converges in O(component diameter) rounds — duplicate clusters are
  * near-cliques (diameter 2-3), so a handful of rounds; each round is ONE
  * hash equi-join of labels to the symmetrized edges plus a groupBy-min —
  * O(E) shuffled rows per round, no driver-side graph, executor-parallel
  * at any scale. Label frames are localCheckpoint'd per round so the
  * iterative plan's lineage stays flat. The round bound is a LOUD guard,
  * not a silent cap: if labels still changed in the final permitted round
  * the operator throws (adversarially long path graphs want the
  * O(log n)-round large-star/small-star variant; corpus dedup does not).
  */
object ConnectedComponents {

  /** (node, component) for every node appearing in `edges`, where
    * component = the minimum node id in the node's connected component.
    * Nodes not mentioned in any edge are absent (callers union isolated
    * rows back with component = own id — see DedupQueries). */
  def components(edges: DataFrame, src: String, dst: String,
                 maxIters: Int = 20): DataFrame = {
    require(maxIters >= 1, "need maxIters >= 1")
    val sym = edges.select(col(src).as("s"), col(dst).as("d"))
      .unionAll(edges.select(col(dst).as("s"), col(src).as("d")))
      .localCheckpoint()
    var labels = sym.select(col("s").as("node"))
      .distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var iters = 0
    var changed = true
    while (changed && iters < maxIters) {
      // neighbor labels flow along edges; a node keeps the min of its
      // own label and everything that arrived
      val next = sym.join(labels, sym("s") === labels("node"))
        .select(col("d").as("node"), col("comp"))
        .unionAll(labels)
        .groupBy("node").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), Seq("node"))
        .where(col("n.comp") =!= col("o.comp"))
        .limit(1).count() > 0
      labels = next
      iters += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "component diameter exceeds the bound; raise maxIters")
    labels
  }
}

package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
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
  * The labels stop changing after at most ECCENTRICITY(min node) ≤
  * component-diameter rounds — duplicate clusters are near-cliques
  * (diameter 2-3), so a handful; certifying convergence costs ONE more
  * no-change round, which the loop grants beyond `maxIters` (so
  * `maxIters` bounds label-CHANGE rounds and sizing it to the expected
  * diameter is safe). Each round is ONE hash equi-join of labels to the
  * symmetrized edges plus a groupBy-min — O(E) shuffled rows per round,
  * no driver-side graph, executor-parallel at any scale. Label frames
  * are localCheckpoint'd per round so the iterative plan's lineage stays
  * flat, and each superseded round's blocks are released immediately
  * (storage stays at ONE live generation, not O(rounds·V) waiting on the
  * ContextCleaner). The round bound is a LOUD guard, not a silent cap:
  * if labels still changed in the final permitted round the operator
  * throws (adversarially long path graphs want the O(log n)-round
  * large-star/small-star variant; corpus dedup does not).
  */
object ConnectedComponents {

  /** One hash-min propagation round as a PURE PLAN (no checkpoint, no
    * execution): neighbor labels flow along the symmetrized edges
    * (`s`, `d`) and every node keeps the min of its own label and all
    * that arrived. The join is an equi-join on the node id; PlanSpec
    * locks that shape HERE — the loop below checkpoints each round, so
    * the round join is invisible in the caller-facing executed plan. */
  def propagationRound(sym: DataFrame, labels: DataFrame): DataFrame =
    sym.join(labels, sym("s") === labels("node"))
      .select(col("d").as("node"), col("comp"))
      .unionAll(labels)
      .groupBy("node").agg(min(col("comp")).as("comp"))

  /** Eager localCheckpoint plus the handle needed to RELEASE it: the
    * checkpointed Dataset's plan is a [[LogicalRDD]] over the persisted
    * internal RDD, so unpersisting that exact RDD (and only it — safe
    * under concurrent sessions, unlike diffing a global registry) frees
    * the round's blocks once the next round has materialized. */
  private def checkpointReleasable(df: DataFrame): (DataFrame, Option[RDD[_]]) = {
    val cp = df.localCheckpoint()
    val rdd = cp.queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }
    (cp, rdd)
  }

  /** (node, component) for every node appearing in `edges`, where
    * component = the minimum node id in the node's connected component.
    * Nodes not mentioned in any edge are absent (callers union isolated
    * rows back with component = own id — see DedupQueries). `maxIters`
    * bounds label-CHANGE rounds (≥ the largest component's min-node
    * eccentricity, ≤ its diameter, suffices); one extra certification
    * round runs beyond it. The returned frame is backed by the final
    * round's local checkpoint (one O(V) generation stays cached). */
  def components(edges: DataFrame, src: String, dst: String,
                 maxIters: Int = 20): DataFrame = {
    require(maxIters >= 1, "need maxIters >= 1")
    val (sym, symRdd) = checkpointReleasable(
      edges.select(col(src).as("s"), col(dst).as("d"))
        .unionAll(edges.select(col(dst).as("s"), col(src).as("d"))))
    var (labels, labelsRdd) = checkpointReleasable(
      sym.select(col("s").as("node"))
        .distinct()
        .withColumn("comp", col("node")))
    var iters = 0L
    var changed = true
    // long arithmetic: maxIters + 1 must not wrap for maxIters = Int.MaxValue
    while (changed && iters < maxIters.toLong + 1L) {
      val (next, nextRdd) = checkpointReleasable(propagationRound(sym, labels))
      changed = next.as("n").join(labels.as("o"), Seq("node"))
        .where(col("n.comp") =!= col("o.comp"))
        .limit(1).count() > 0
      // this round's frame is materialized and compared; the superseded
      // generation's blocks can go now
      labelsRdd.foreach(_.unpersist(blocking = false))
      labels = next
      labelsRdd = nextRdd
      iters += 1
    }
    symRdd.foreach(_.unpersist(blocking = false))
    if (changed) {
      // the frame is never returned on this path — release its blocks too
      labelsRdd.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"connected components still changing after $maxIters label-change " +
          "rounds — component diameter exceeds the bound; raise maxIters")
    }
    labels
  }
}

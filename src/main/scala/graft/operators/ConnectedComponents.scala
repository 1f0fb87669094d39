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

  /** In-plan non-null guard on the edge endpoints: a null src/dst would
    * silently vanish through the equi-join and the distinct-node seed,
    * returning quietly incomplete components — fail loudly instead.
    * `assert_true` throws on the first offending ROW at execution time
    * and returns NULL otherwise, so `.where(assert_true(...).isNull)`
    * keeps every valid row and costs no extra Spark action. */
  private def requireNonNullEndpoints(edges: DataFrame,
                                      src: String, dst: String): DataFrame =
    edges.where(assert_true(
      col(src).isNotNull && col(dst).isNotNull,
      lit(s"connected components: null edge endpoint in ($src, $dst)")).isNull)

  /** (node, component) for every node appearing in `edges`, where
    * component = the minimum node id in the node's connected component.
    * Nodes not mentioned in any edge are absent (callers union isolated
    * rows back with component = own id — see DedupQueries). `maxIters`
    * bounds label-CHANGE rounds (≥ the largest component's min-node
    * eccentricity, ≤ its diameter, suffices); one extra certification
    * round runs beyond it. The returned frame is backed by the final
    * round's local checkpoint (one O(V) generation stays cached).
    * Null edge endpoints throw. */
  def components(edges: DataFrame, src: String, dst: String,
                 maxIters: Int = 20): DataFrame = {
    require(maxIters >= 1, "need maxIters >= 1")
    val guarded = requireNonNullEndpoints(edges, src, dst)
    val (sym, symRdd) = checkpointReleasable(
      guarded.select(col(src).as("s"), col(dst).as("d"))
        .unionAll(guarded.select(col(dst).as("s"), col(src).as("d"))))
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
          "rounds — component diameter exceeds the bound; raise maxIters " +
          "or use componentsStar (O(log n) rounds at any diameter)")
    }
    labels
  }

  /** Same contract as [[components]] — (node, min-id component) for every
    * node appearing in `edges` — via alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
    * "Connected Components in MapReduce and Beyond", SoCC 2014): the
    * round count is O(log n) in the WORST case, independent of component
    * diameter, where hash-min pays one round per hop of the min node's
    * eccentricity. The per-round cost is the same class — each phase is
    * one groupBy-min over O(E) rows plus one equi-join back on the
    * grouping key — so this is the variant for adversarial diameters
    * (long chains); near-clique dedup graphs converge in 2-3 rounds
    * either way and hash-min's simpler rounds win there.
    *
    *   - large-star: every node u links each LARGER neighbor to the
    *     minimum of its closed neighborhood m(u) = min(N(u) + u) —
    *     long paths contract toward small ids without breaking
    *     connectivity.
    *   - small-star: with edges held canonical (big, small), every node
    *     u re-links its smaller neighbors (and itself) to their minimum
    *     — chains become stars.
    *
    * Convergence = the canonical edge set reaches a fixpoint (checked
    * EXACTLY with two anti-join probes, never a fingerprint); the result
    * is then a star forest read off directly. Each round's edge set is
    * localCheckpoint'd and superseded generations are released eagerly,
    * like the hash-min loop; `maxIters` keeps the LOUD bound semantics
    * (2·ceil(log2 n) + a margin always suffices — the default covers any
    * input that fits in a cluster). Null edge endpoints throw. */
  def componentsStar(edges: DataFrame, src: String, dst: String,
                     maxIters: Int = 40): DataFrame = {
    require(maxIters >= 1, "need maxIters >= 1")
    val guarded = requireNonNullEndpoints(edges, src, dst)
    // the node universe (self-loop-only nodes included) is pinned ONCE up
    // front — the final readout must not re-execute the caller's whole
    // edge pipeline (often an expensive band-join) a second time
    val (allNodes, allNodesRdd) = checkpointReleasable(
      guarded.select(col(src).as("node"))
        .unionAll(guarded.select(col(dst).as("node")))
        .distinct())
    // canonical undirected edge set: (u = larger, v = smaller), self-loops
    // dropped, duplicates collapsed
    var (e, eRdd) = checkpointReleasable(
      guarded.select(greatest(col(src), col(dst)).as("u"),
          least(col(src), col(dst)).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    var iters = 0
    var changed = true
    while (changed && iters < maxIters) {
      // ---- large-star over the symmetrized adjacency
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
      val m1 = sym.groupBy("a")
        .agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      // emit (bigger neighbor b, m(a)) — b > a >= m, so (b, m) is canonical
      val ls = sym.join(m1, "a").where(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // ---- small-star on the canonical (big, small) edges
      val m2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(m2, "u")
        .select(col("v").as("x"), col("m"))
        .unionAll(m2.select(col("u").as("x"), col("m")))
        .where(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .distinct()
      val (next, nextRdd) = checkpointReleasable(ss)
      // exact fixpoint test: set equality via two one-row anti-join probes
      changed =
        next.join(e, Seq("u", "v"), "left_anti").limit(1).count() > 0 ||
          e.join(next, Seq("u", "v"), "left_anti").limit(1).count() > 0
      eRdd.foreach(_.unpersist(blocking = false))
      e = next
      eRdd = nextRdd
      iters += 1
    }
    if (changed) {
      eRdd.foreach(_.unpersist(blocking = false))
      allNodesRdd.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"componentsStar still changing after $maxIters rounds — " +
          "O(log n) convergence should never need this many; raise maxIters")
    }
    // the fixpoint is a star forest: non-roots carry exactly one edge to
    // their component min; roots (and nothing else) appear only as `v`.
    // Every node of the ORIGINAL edge list gets a row, like components().
    val (out, _) = checkpointReleasable(
      allNodes.join(e.select(col("u").as("node"), col("v").as("comp")),
          Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("comp"), col("node")).as("comp")))
    eRdd.foreach(_.unpersist(blocking = false))
    allNodesRdd.foreach(_.unpersist(blocking = false))
    out
  }
}

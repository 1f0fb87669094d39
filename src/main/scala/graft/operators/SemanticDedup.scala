package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.operators.IvfIndex.Centroid

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): cluster the corpus embeddings with k-means, compare
  * pairs only WITHIN a cluster, and among each set of semantic duplicates
  * keep the example FARTHEST from its cluster centroid (the paper's rule —
  * centroid-near points are the cluster's redundant core; the far ones
  * carry the marginal information).
  *
  * This composes two artifacts the engine already maintains:
  *   - the k-means centroid model (the IVF coarse quantizer — the
  *     committed `fixtures/ivf_centroids.parquet` model in the gates), and
  *   - the STORED `cell` column ([[IvfIndex.withCell]]), which at scale is
  *     the table's partition key, so the within-cell self-join reads
  *     co-partitioned data.
  *
  * Contract (deterministic, SQL-replayable):
  *   - cell assignment = [[IvfIndex.cellColumn]] (euclidean argmin, ties to
  *     the smaller centroid id) — identical to the search index.
  *   - `cdist` = cosine distance of the embedding to its OWN cell centroid,
  *     rounded to 6 (+Inf for a zero-norm embedding) — the keep priority.
  *   - a pair qualifies iff both rows share a cell and their rounded
  *     cosine distance is <= `threshold` (+Inf on a zero norm never
  *     qualifies, so zero-norm rows are never semantic duplicates).
  *   - keep priority: larger `cdist` wins; ties keep the SMALLER id. A row
  *     is dropped iff SOME qualifying partner strictly dominates it.
  *     Priority compares the ROUNDED cdist, so both engines agree
  *     bit-for-bit.
  *
  * Scale shape: pair work is sum over cells of n_c^2 — bounded by the
  * coarse model's occupancy, which is exactly what the engine's IVF
  * maintenance (`retrainIvfIndexIfSkewed`) keeps balanced as the corpus
  * grows (C scales with n, so n_c ~ n/C stays fixed). Exact-duplicate
  * vectors are collapsed to one representative BEFORE the join (a group of
  * m copies costs one row, not m^2 pair comparisons), and the join is
  * salted so one hot cell fans over `salt` reduce slots. Never all-pairs,
  * never a cartesian: the join key is (cell, salt).
  */
object SemanticDedup {

  /** Per-row cluster assignment + keep priority: (id, cell, cdist) with
    * `cdist` = round(cosine(emb, own-cell centroid), 6) (+Inf on a
    * zero-norm embedding), plus the input `emb` column (the dedup joins
    * reuse it). The centroid lookup is a broadcast equi-join against the
    * O(C x dim) model — never a shuffle of the corpus. */
  def assignments(df: DataFrame, id: Column, emb: Column,
                  centroids: Seq[Centroid]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = centroids.map(c => (c.id, c.vec.toSeq)).toDF("cell", "cv")
      .select(col("cell"), col("cv").cast("array<float>").as("cv"))
    val assigned = IvfIndex.withCell(df.select(id.as("id"), emb.as("emb")),
      col("emb"), centroids)
    val nrm = sqrt(VectorExpressions.dotProduct(col("emb"), col("emb")))
    val cnrm = sqrt(VectorExpressions.dotProduct(col("cv"), col("cv")))
    val raw = when(nrm === 0.0d || cnrm === 0.0d, lit(Double.PositiveInfinity))
      .otherwise(lit(1.0d) -
        VectorExpressions.dotProduct(col("emb"), col("cv")) / (nrm * cnrm))
    assigned.join(broadcast(cents), "cell")
      .select(col("id"), col("emb"), col("cell"),
        (round(raw, 6) + lit(0.0d)).as("cdist"))
  }

  /** Qualifying semantic-duplicate pairs: (id_a, id_b, distance) with
    * id_a < id_b, rounded cosine distance <= threshold, both rows in the
    * same cell. Exact-duplicate collapse + salted within-cell join (see
    * object scaladoc). */
  def pairs(df: DataFrame, id: Column, emb: Column,
            centroids: Seq[Centroid], threshold: Double,
            salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    val (members, reps) = collapse(df, id, emb, centroids)
    val repPairs = repEdges(reps, threshold, salt, bothOrders = false)
      .select(col("grp_a"), col("grp_b"), col("distance"))
    // identical NONZERO vectors: same cell, rounded cosine distance 0.0
    val withinGroups = reps
      .where(col("nrm") > 0.0d && lit(0.0d) <= threshold)
      .select(col("id").as("grp"), lit(0.0d).as("distance"))
    NearDup.expandPairs(members, repPairs, withinGroups, "distance")
  }

  /** SemDeDup survivors: (id, cell, cdist) for every row NOT dominated by
    * a qualifying partner (see the keep-priority contract above), ordered
    * by id.
    *
    * Implementation is rep-level — equivalent to the member-level
    * contract because an exact-duplicate group shares every distance: a
    * nonzero-norm group's non-representative members are always dominated
    * by their own representative (pair distance 0.0 <= any nonnegative
    * threshold, cdist tie, smaller id), and if any member of another
    * group dominates a representative by id tie-break then so does that
    * group's representative (it holds the group's MINIMUM id). Zero-norm
    * groups have no qualifying pairs at all (+Inf distance), so ALL their
    * members survive. SemanticDedupSpec property-checks this equivalence
    * against a brute-force member-level evaluation. */
  def survivors(df: DataFrame, id: Column, emb: Column,
                centroids: Seq[Centroid], threshold: Double,
                salt: Int = 8): DataFrame = {
    require(threshold >= 0.0d, "a negative threshold qualifies no pair")
    require(salt > 0, "salt must be positive")
    val (members, reps) = collapse(df, id, emb, centroids)
    // every qualifying rep pair in BOTH orders -> the dominated endpoint
    val edges = repEdges(reps, threshold, salt, bothOrders = true)
    val dominated = edges.where(
        col("b_cdist") > col("a_cdist") ||
          (col("b_cdist") === col("a_cdist") && col("grp_b") < col("grp_a")))
      .select(col("grp_a").as("grp")).distinct()
    // drop set: dominated reps + nonzero-norm groups' non-rep members
    val nonRepDrops = members.join(
        reps.where(col("nrm") > 0.0d).select(col("id").as("grp")), "grp")
      .where(col("id") =!= col("grp")).select(col("id"))
    val repDrops = members.join(dominated, "grp").select(col("id"))
    val assigned = reps.select(col("id").as("grp"), col("cell"), col("cdist"))
    members.join(assigned, "grp")
      .join(nonRepDrops.union(repDrops).distinct(), Seq("id"), "left_anti")
      .select(col("id"), col("cell"), col("cdist"))
      .orderBy(col("id"))
  }

  /** Exact-duplicate collapse on the RAW vector (the
    * [[NearDup.embeddingNearDupPairs]] convention — a hashed key could
    * merge two distinct embeddings): members (id, grp) + one
    * representative row per distinct vector carrying (grp, id=grp, emb,
    * cell, cdist, nrm), checkpointed because both join sides and the
    * expansion reuse it. */
  private def collapse(df: DataFrame, id: Column, emb: Column,
                       centroids: Seq[Centroid]): (DataFrame, DataFrame) = {
    val keyed = df.select(id.as("id"), emb.as("emb"))
    val groups = keyed.groupBy(col("emb")).agg(min(col("id")).as("grp"))
    val members = keyed.join(groups, "emb").select(col("id"), col("grp"))
      .localCheckpoint()
    val reps = assignments(
        groups.select(col("grp"), col("emb")), col("grp"), col("emb"),
        centroids)
      .withColumn("nrm",
        sqrt(VectorExpressions.dotProduct(col("emb"), col("emb"))))
      .localCheckpoint()
    (members, reps)
  }

  /** Qualifying rep-level edges via the salted within-cell equi-join.
    * bothOrders=false: one row per unordered pair (grp_a < grp_b), with
    * `distance`. bothOrders=true: each unordered pair appears in both
    * orientations, carrying (a_cdist, b_cdist) for the domination test.
    * For a fixed unordered pair exactly one (left-salt, right-replica)
    * cell matches, so no pair is ever emitted twice per orientation. */
  private def repEdges(reps: DataFrame, threshold: Double, salt: Int,
                       bothOrders: Boolean): DataFrame = {
    val a = reps.withColumn("salt", pmod(hash(col("id")), lit(salt)).cast("long"))
    val b = reps.withColumn("salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
    val order =
      if (bothOrders) col("a.id") =!= col("b.id")
      else col("a.id") < col("b.id")
    val raw = when(col("a.nrm") === 0.0d || col("b.nrm") === 0.0d,
        lit(Double.PositiveInfinity))
      .otherwise(lit(1.0d) -
        VectorExpressions.dotProduct(col("a.emb"), col("b.emb")) /
          (col("a.nrm") * col("b.nrm")))
    a.as("a").join(b.as("b"),
        col("a.cell") === col("b.cell") && col("a.salt") === col("b.salt") &&
          order)
      .withColumn("distance", round(raw, 6) + lit(0.0d))
      .where(col("distance") <= threshold)
      .select(col("a.id").as("grp_a"), col("b.id").as("grp_b"),
        col("a.cdist").as("a_cdist"), col("b.cdist").as("b_cdist"),
        col("distance"))
  }
}

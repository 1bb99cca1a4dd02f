package graft.ops

import graft.functions.VectorFunctions.{vec_dot, vec_norm, vec_sum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation (topic balancing,
  * per-cluster sampling quotas, cluster-level dedup budgets).
  *
  * One Lloyd iteration, Spark-shaped: centroids are k deterministically
  * hash-sampled vectors (the same Knuth-scramble rule the IVF coarse
  * quantizer uses — no collect, no RNG state, replayable in SQL), the
  * assignment is a broadcast cross join scoring O(n*k) pairs, and the
  * update is one hash aggregation per cell. k is caller-fixed, so at
  * 100 TB the broadcast stays k rows and the shuffle carries one row per
  * vector into a k-group aggregate — map-side partials collapse it to k
  * rows per partition.
  */
object Clustering {

  /** Assign every vector to its max-cosine centroid (ties broken toward
    * the higher centroid id, matching max-struct semantics). Returns one
    * row per vector: (vec_id, cell, cos, comp_sum). */
  def assign(embeddings: DataFrame, k: Int): DataFrame = {
    val scramble = pmod(col("vec_id") * lit(2654435761L), lit(4294967296L))
    val cents = embeddings
      .orderBy(scramble.asc, col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        vec_norm(col("embedding")).as("cent_norm"))
    embeddings
      .select(col("vec_id"), col("embedding"), vec_norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("cos",
        vec_dot(col("embedding"), col("cent_emb")) / (col("nrm") * col("cent_norm")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), col("cent_id"))).as("m"),
        first(vec_sum(col("embedding"))).as("comp_sum"))
      .select(col("vec_id"), col("m.cent_id").as("cell"),
        col("m.cos").as("cos"), col("comp_sum"))
  }

  /** SemDeDup-style semantic dedup: cluster with the coarse quantizer,
    * then keep-first cosine dedup WITHIN cells only. The clustering is
    * what makes semantic dedup affordable — pair work is quadratic in
    * CELL size, not corpus size, so k is chosen as n/targetCellSize and
    * the cross-cell near-misses are the accepted recall trade (the
    * SemDeDup paper's design). Complements the LSH-prefiltered dedup
    * (Similarity.cosineDedupVerdicts): learned data-adaptive cells vs
    * random hyperplane buckets. One row per vector, always. */
  def semanticDedup(embeddings: DataFrame, k: Int = 8,
                    threshold: Double = 0.45): DataFrame = {
    import graft.functions.VectorFunctions.{vec_dot => dot, vec_norm => nrm}
    val cells = assign(embeddings, k).select(col("vec_id"), col("cell"))
    val emb = embeddings
      .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("n2"))
      .join(cells, Seq("vec_id"))
    val l = emb.select(col("cell"), col("vec_id").as("left_id"),
      col("embedding").as("l_emb"), col("n2").as("l_norm"))
    val r = emb.select(col("cell"), col("vec_id").as("right_id"),
      col("embedding").as("r_emb"), col("n2").as("r_norm"))
    val pairs = l.join(r, Seq("cell")).filter(col("left_id") < col("right_id"))
      .withColumn("cos_sim",
        round(dot(col("l_emb"), col("r_emb")) / (col("l_norm") * col("r_norm")), 6))
      .filter(col("cos_sim") >= threshold)
    val best = pairs.groupBy(col("right_id").as("vec_id"))
      .agg(max(struct(col("cos_sim"), col("left_id"))).as("m"))
      .select(col("vec_id"), col("m.left_id").as("dup_of"),
        col("m.cos_sim").as("dup_cos"))
    cells.join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("dup_cos"))
  }

  /** One k-means step reported per cell: member count, mean cosine to the
    * current centroid (cohesion), and the component sum of the UPDATED
    * centroid (the mean vector) — a scalar fingerprint, since
    * sum_j mean_members(v_j) = mean_members(sum_j v_j) by linearity.
    * Means follow the exact-decimal rule (round to 6dp, sum as decimal,
    * divide by count in double) so partial-aggregation order can never
    * change a bit. */
  def kmeansStep(embeddings: DataFrame, k: Int = 8): DataFrame =
    assign(embeddings, k)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("cos"), 6).cast("decimal(28,6)")).as("cos_sum"),
        sum(round(col("comp_sum"), 6).cast("decimal(28,6)")).as("comp_total"))
      .select(col("cell"), col("n_members"),
        round(col("cos_sum").cast("double") / col("n_members"), 6).as("mean_cos"),
        round(col("comp_total").cast("double") / col("n_members"), 6)
          .as("new_centroid_comp_sum"))
}

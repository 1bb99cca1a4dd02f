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

package graft.ops

import graft.functions.VectorFunctions.{vec_dot, vec_norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Vector math runs through the native codegen'd `VecDot` expression
  * (graft.functions) — a tight primitive loop, no per-pair allocation —
  * with the same left-to-right accumulation order as the DuckDB oracle's
  * sequential list_sum, so values stay bit-identical. Norms are
  * precomputed once per side BEFORE the pair join: an all-pairs plan that
  * recomputes norms per pair does 3x the vector work for nothing.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the candidate table — no shuffle on the candidate side until
  * the final per-query top-k; the LSH path buckets candidates by a
  * random-hyperplane signature so each query compares against one bucket,
  * the 100 TB-friendly plan (bucket join instead of full cross product).
  */
object Similarity {

  /** Left-fold dot product in double precision (kept as the public
    * combinator; delegates to the native expression). */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def l2norm(a: Column): Column = vec_norm(a)

  def cosine(a: Column, b: Column): Column = vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Brute-force cosine top-k: every vec_id divisible by `queryStride` is
    * a query; each query's k nearest candidates (excluding itself) by
    * cosine, rounded to 6 decimals with doc-id tiebreak so ordering is
    * well-defined across engines.
    */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 10, queryStride: Int = 50): DataFrame = {
    val q = embeddings.filter(pmod(col("vec_id"), lit(queryStride)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
    val c = embeddings.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      vec_norm(col("embedding")).as("c_norm"))
    val pairs = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos_sim",
        round(vec_dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6))
    // bounded top-k aggregation, not a window: partial k-buffers merge
    // map-side, so the shuffle carries k rows per (query, task) instead
    // of sorting every candidate row per query
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.TopKAggregator.top_k(k)(col("cos_sim"), col("c_id")).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("t"))
      .select(col("q_id"), col("t.id").as("c_id"), col("t.score").as("cos_sim"))
  }

  /** Exact nearest neighbor for EVERY vector (k=1 all-pairs form):
    * deterministic, one row per vector — the correctness baseline the
    * LSH/IVF path approximates. */
  def nearestNeighbor(embeddings: DataFrame): DataFrame = {
    val a = embeddings.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      vec_norm(col("embedding")).as("q_norm"))
    val b = embeddings.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      vec_norm(col("embedding")).as("c_norm"))
    val pairs = a.join(b, col("q_id") =!= col("c_id"))
      .withColumn("cos_sim",
        round(vec_dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6))
    val best = pairs.groupBy(col("q_id"))
      .agg(max(struct(col("cos_sim"), (-col("c_id")).as("neg_id"))).as("m"))
    best.select(col("q_id"), (-col("m.neg_id")).cast("long").as("nn_id"),
      col("m.cos_sim").as("cos_sim"))
  }

  /** Deterministic random hyperplanes: nBits x dim gaussian matrix from a
    * fixed seed. */
  private[ops] def hyperplanes(nBits: Int, dim: Int, seed: Long = 123L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection LSH bucket id (nBits-bit int): one native dot
    * per plane against a literal vector, summed Scala-side into the
    * bucket int — no lambda plumbing at all. */
  def lshBucket(emb: Column, nBits: Int = 12, dim: Int = 64): Column = {
    val planes = hyperplanes(nBits, dim)
    (0 until nBits).map { j =>
      when(vec_dot(emb, typedLit(planes(j).toArray)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries only compare against
    * candidates in their own bucket. Recall < 1 by construction; the
    * bucket join replaces the cross product, which is the point at scale.
    */
  def lshTopK(embeddings: DataFrame, k: Int = 10, queryStride: Int = 50,
              nBits: Int = 8): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col("embedding"), nBits))
      .withColumn("nrm", vec_norm(col("embedding")))
    val q = bucketed.filter(pmod(col("vec_id"), lit(queryStride)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_norm"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("nrm").as("c_norm"), col("bucket"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim",
        round(vec_dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6))
    // a query probes exactly its own bucket, so bucket is constant per
    // q_id and can ride along as a grouping key
    pairs.groupBy(col("q_id"), col("bucket"))
      .agg(graft.functions.TopKAggregator.top_k(k)(col("cos_sim"), col("c_id")).as("tk"))
      .select(col("q_id"), col("bucket"), explode(col("tk")).as("t"))
      .select(col("q_id"), col("t.id").as("c_id"), col("bucket"), col("t.score").as("cos_sim"))
  }

  /** IVF (inverted-file) approximate search: a deterministic coarse
    * quantizer — every `centroidStride`-th vector is a centroid — assigns
    * each vector to its nearest centroid cell; queries probe only the
    * `nProbe` nearest cells. Unlike sign-LSH this adapts to the data
    * distribution. At scale the assignment is one broadcast of centroids
    * + a narrow pass; the search joins query cells to candidate cells —
    * pair volume is n * (nProbe / nCells) of brute force.
    */
  def ivfTopK(embeddings: DataFrame, k: Int = 10, queryStride: Int = 50,
              centroidStride: Int = 25, nProbe: Int = 4): DataFrame = {
    val centroids = embeddings.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        vec_norm(col("embedding")).as("cent_norm"))
    val base = embeddings.select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))
    // rank every (vector, centroid) pair; cell = argmax cosine
    val scored = base.crossJoin(broadcast(centroids))
      .withColumn("cent_cos",
        vec_dot(col("embedding"), col("cent_emb")) / (col("nrm") * col("cent_norm")))
    val assign = scored.groupBy(col("vec_id"))
      .agg(max(struct(col("cent_cos"), col("cent_id"))).as("m"),
        first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("m.cent_id").as("cell"), col("embedding"), col("nrm"))
    // queries probe their nProbe nearest cells
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cent_cos").desc, col("cent_id").asc)
    val probes = scored.filter(pmod(col("vec_id"), lit(queryStride)) === 0)
      .withColumn("rp", row_number().over(w)).filter(col("rp") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_norm"), col("cent_id").as("cell"))
    val pairs = assign.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim",
        round(vec_dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("nrm")), 6))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    pairs.withColumn("rn", row_number().over(wk)).filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("c_id"), col("cell"), col("cos_sim"))
  }

  /** Per-vector dedup verdict: a vector is a duplicate if some LOWER-id
    * vector in its LSH bucket exceeds the cosine threshold (keep-first
    * policy). One row per vector, always — is_dup + best match evidence.
    */
  def cosineDedupVerdicts(embeddings: DataFrame, threshold: Double = 0.9,
                          nBits: Int = 8): DataFrame = {
    val pairs = cosineNearDupPairs(embeddings, threshold, nBits)
    val best = pairs.groupBy(col("right_id").as("vec_id"))
      .agg(max(struct(col("cos_sim"), col("left_id"))).as("m"))
      .select(col("vec_id"), col("m.left_id").as("dup_of"), col("m.cos_sim").as("dup_cos"))
    embeddings.select(col("vec_id")).join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("dup_cos"))
  }

  /** Embedding-cosine near-duplicate pairs (cos >= threshold, left < right),
    * LSH-prefiltered: only same-bucket pairs are scored exactly. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.9,
                         nBits: Int = 8): DataFrame = {
    val bucketed = embeddings
      .select(col("vec_id"), col("embedding"), lshBucket(col("embedding"), nBits).as("bucket"),
        vec_norm(col("embedding")).as("nrm"))
    val l = bucketed.select(col("vec_id").as("left_id"), col("embedding").as("l_emb"),
      col("bucket"), col("nrm").as("l_norm"))
    val r = bucketed.select(col("vec_id").as("right_id"), col("embedding").as("r_emb"),
      col("bucket"), col("nrm").as("r_norm"))
    l.join(r, Seq("bucket")).filter(col("left_id") < col("right_id"))
      .withColumn("cos_sim",
        round(vec_dot(col("l_emb"), col("r_emb")) / (col("l_norm") * col("r_norm")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("left_id"), col("right_id"), col("cos_sim"))
  }
}

package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

/** Bounded top-k aggregation: correctness vs the window formulation. */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top_k keeps the k best with (score desc, id asc) tie order") {
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.5, 1L), (1L, 0.99, 2L), (1L, 0.1, 3L),
      (2L, 0.3, 7L))
      .toDF("g", "score", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKAggregator.top_k(3)(col("score"), col("id")).as("tk"))
      .collect().map(r => r.getAs[Long]("g") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1)))).toMap
    assert(got(1L) === Seq((0.99, 2L), (0.9, 5L), (0.9, 10L))) // tie: lower id first
    assert(got(2L) === Seq((0.3, 7L)))
  }

  test("aggregated top-k equals the window row_number formulation on testdata") {
    val emb = Tables.embeddings(spark, sfDir)
    val agg = graft.ops.Similarity.bruteForceTopK(emb, k = 7)
    // reference: window formulation
    val q = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val pairs = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", round(graft.ops.Similarity.cosine(col("q_emb"), col("c_emb")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id").asc)
    val windowed = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("q_id"), col("c_id"), col("cos_sim"))
    assert(agg.exceptAll(windowed).isEmpty && windowed.exceptAll(agg).isEmpty)
  }
}

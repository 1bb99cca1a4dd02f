package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 symmetric quantization for embedding columns — the 4x storage
  * reduction step before shipping vectors to an ANN index. Per-vector
  * scale = max|x| / 127; all arithmetic is per-row higher-order functions
  * (no shuffle), and both quantize and reconstruct are exposed so the
  * error metrics are measurable in-engine.
  */
object Quantize {

  /** Per-vector scale column. */
  def scaleOf(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double")))) / lit(127.0)

  /** int8 codes (stored as array<tinyint>). A zero vector has scale 0;
    * its codes are all zero rather than NULLs from division by zero. */
  def quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast("double") / scale)).cast("tinyint"))

  /** Reconstructed doubles from codes + scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Quantization quality report: one row per vector with the scale,
    * mean-squared reconstruction error, and max absolute error. */
  def qualityReport(embeddings: DataFrame): DataFrame = {
    val withScale = embeddings.withColumn("scale", scaleOf(col("embedding")))
    val withCodes = withScale.withColumn("codes", quantize(col("embedding"), col("scale")))
    val withRecon = withCodes.withColumn("recon", dequantize(col("codes"), col("scale")))
    val err = zip_with(col("embedding"), col("recon"),
      (x, r) => (x.cast("double") - r) * (x.cast("double") - r))
    withRecon.select(
      col("vec_id"), col("scale"),
      (aggregate(err, lit(0.0), (a, v) => a + v) / size(col("embedding"))).as("mse"),
      sqrt(array_max(err)).as("max_abs_err"))
  }
}

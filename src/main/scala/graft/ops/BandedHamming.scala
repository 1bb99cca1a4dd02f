package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded hamming self-join over 64-bit perceptual signatures — the
  * shared near-dup candidate device of the image (aHash, p76) and
  * audio (energy-delta fingerprint, p79) families: the signature
  * splits into four 16-bit bands; hamming ≤ 3 guarantees (pigeonhole)
  * at least one band identical, so candidate pairs come from a
  * self-equi-join on (band, value) — never all pairs — and only the
  * candidates pay the exact popcount verify. At 100 TB this is the
  * same shuffle shape as MinHash-LSH: one exchange on the band value,
  * pair volume bounded by bucket occupancy, no cartesian anywhere.
  */
object BandedHamming {

  /** `sigs` must carry (doc_id, lo, hi) — the 64-bit signature split
    * into two longs (bit k in `lo` for k<32, else `hi` at k−32).
    * Returns (left_id, right_id, hamming) for every unordered pair at
    * hamming ≤ `maxHamming`. */
  def pairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 x 16-bit bands only guarantee recall for hamming <= 3")
    val banded = sigs.select(col("doc_id"), col("lo"), col("hi"),
        explode(array((0 until 4).map { b =>
          val src = if (b < 2) col("lo") else col("hi")
          struct(lit(b).as("band"),
            shiftright(src, (b % 2) * 16).bitwiseAND(lit(0xffffL)).as("v"))
        }: _*)).as("bv"))
      .select(col("doc_id"), col("lo"), col("hi"),
        col("bv.band"), col("bv.v"))
    val l = banded.select(col("band"), col("v"), col("doc_id").as("left_id"),
      col("lo").as("llo"), col("hi").as("lhi"))
    val r = banded.select(col("band"), col("v"), col("doc_id").as("right_id"),
      col("lo").as("rlo"), col("hi").as("rhi"))
    l.join(r, Seq("band", "v")).filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        (bit_count(col("llo").bitwiseXOR(col("rlo"))) +
          bit_count(col("lhi").bitwiseXOR(col("rhi")))).cast("long")
          .as("hamming"))
      .distinct() // a close pair collides in several bands
      .filter(col("hamming") <= maxHamming)
  }
}

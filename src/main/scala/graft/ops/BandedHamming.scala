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
  *
  * LIFETIME CONTRACT of [[pairs]] / [[distinctPairs]] (ADVICE r21 /
  * VERDICT r21 item 6 — the decode-once materialization's fine print):
  *
  *  - EAGER: each call runs the signature job at CONSTRUCTION time
  *    (`localCheckpoint(true)`), not lazily at the first action — these
  *    are not pure plan-builders.
  *  - PINNED BLOCKS: the 24-byte/row checkpointed frame stays in the
  *    block manager until the CALLER releases it; the frames returned
  *    here are lazy, so there is no in-function point after the
  *    consuming action to unpersist at. Long-lived sessions calling the
  *    media family repeatedly should sweep between calls exactly as the
  *    bench does between rows:
  *    `spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))`.
  *    Each pinned frame is small by construction (signatures, never
  *    payloads), so the growth is bounded blocks, not decoded media.
  *  - NO RECOMPUTE: localCheckpoint truncates lineage — on executor
  *    loss a consuming job FAILS instead of silently re-running the
  *    decode, the standard Spark trade accepted here because re-decoding
  *    the corpus is precisely the cost the checkpoint exists to avoid;
  *    a caller needing fault tolerance should persist the signature
  *    frame to storage instead.
  */
object BandedHamming {

  /** One row per (input row, band): the input's columns plus
    * (band, v) — the 4×16-bit band decomposition every caller joins
    * on. Shared by [[pairs]], [[distinctPairs]] and the occupancy
    * analysis tooling so the banding scheme has exactly one
    * definition. */
  private[graft] def bandedFrame(sigs: DataFrame): DataFrame = {
    val carried = sigs.columns.map(col).toSeq
    sigs.select(carried :+
        explode(array((0 until 4).map { b =>
          val src = if (b < 2) col("lo") else col("hi")
          struct(lit(b).as("band"),
            shiftright(src, (b % 2) * 16).bitwiseAND(lit(0xffffL)).as("v"))
        }: _*)).as("bv"): _*)
      .select(carried ++ Seq(col("bv.band"), col("bv.v")): _*)
  }

  /** `sigs` must carry (doc_id, lo, hi) — the 64-bit signature split
    * into two longs (bit k in `lo` for k<32, else `hi` at k−32).
    * Returns (left_id, right_id, hamming) for every unordered pair at
    * hamming ≤ `maxHamming`. */
  def pairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 x 16-bit bands only guarantee recall for hamming <= 3")
    // `sigs` is typically the output of a codec decode pass (PNG/WAV/
    // GIF mapPartitions) — the costliest per-row work in the media
    // families — and the self-join below references it on BOTH sides,
    // so without materialization the whole decode ran TWICE per action
    // (guide §1.2 step 1: don't recompute; measured ~2x on p86, whose
    // 65-frame GIF decode is the catalog's heaviest). The projection is
    // 24 bytes/row, so an eager localCheckpoint pays one decode pass
    // plus a negligible block-manager write to serve both branches.
    val banded = bandedFrame(
      sigs.select("doc_id", "lo", "hi").localCheckpoint(true))
    val l = banded.select(col("band"), col("v"), col("doc_id").as("left_id"),
      col("lo").as("llo"), col("hi").as("lhi"))
    val r = banded.select(col("band"), col("v"), col("doc_id").as("right_id"),
      col("lo").as("rlo"), col("hi").as("rhi"))
    l.join(r, Seq("band", "v")).filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        (bit_count(col("llo").bitwiseXOR(col("rlo"))) +
          bit_count(col("lhi").bitwiseXOR(col("rhi")))).cast("long")
          .as("hamming"))
      // cheap popcount gate BEFORE the dedup shuffle: far-apart
      // candidates (the vast majority) never reach the distinct
      .filter(col("hamming") <= maxHamming)
      .distinct() // a close pair collides in several bands
  }

  /** The SCALE PATH when signature mass concentrates — boilerplate
    * images (logos, icons, tracking pixels) and template audio give a
    * perceptual-hash distribution where many items share one exact
    * signature, and [[pairs]]' doc-level output is then inherently
    * quadratic in the hot signatures' multiplicity (the sf0.8 amplified
    * sweep measured the image fixture at 8.6M doc-pairs from 7 299
    * distinct hashes — slope 1.46, all of it OUTPUT volume). This
    * variant dedups to DISTINCT signatures first (hash groupBy:
    * representative = min doc_id, multiplicity = count), bands over
    * the distinct signatures only, and emits one row per near
    * signature PAIR with the doc-pair count carried as
    * `n_pairs = n_left · n_right` — candidate volume quadratic in
    * distinct-bucket occupancy, output linear in distinct near pairs.
    * Same-signature (hamming-0 within a group) doc pairs are the exact
    * dedup groups and deliberately not re-emitted here — that is
    * `count per signature`, one aggregate. */
  def distinctPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 x 16-bit bands only guarantee recall for hamming <= 3")
    // distinct-signature representatives: aggregated (so decode-once is
    // already paid by the shuffle) but referenced on both sides of the
    // self-join below — materialize the tiny distinct frame instead of
    // re-running decode + aggregate per branch (same rationale as
    // [[pairs]])
    val reps = sigs.groupBy(col("lo"), col("hi"))
      .agg(min(col("doc_id")).as("rep_id"),
        count(lit(1)).cast("long").as("n_docs"))
      .localCheckpoint(true)
    val banded = bandedFrame(reps)
    val l = banded.select(col("band"), col("v"), col("rep_id").as("left_id"),
      col("n_docs").as("ln"), col("lo").as("llo"), col("hi").as("lhi"))
    val r = banded.select(col("band"), col("v"), col("rep_id").as("right_id"),
      col("n_docs").as("rn"), col("lo").as("rlo"), col("hi").as("rhi"))
    l.join(r, Seq("band", "v")).filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        (bit_count(col("llo").bitwiseXOR(col("rlo"))) +
          bit_count(col("lhi").bitwiseXOR(col("rhi")))).cast("long")
          .as("hamming"),
        (col("ln") * col("rn")).as("n_pairs"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}

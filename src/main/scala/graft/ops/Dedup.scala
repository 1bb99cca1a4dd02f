package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation, each designed as a
  * shuffle-frugal distributed plan:
  *
  *  - exact: one hash-aggregate on the content key (map-side partial
  *    aggregation collapses duplicates before the shuffle);
  *  - MinHash + LSH: per-doc signatures (narrow), explode to (band, hash)
  *    keys, self-equi-join on the band key — the only shuffle is on band
  *    buckets, never the O(n²) pair space;
  *  - SimHash: 64-bit signature per doc (narrow), candidate pairs via
  *    16-bit chunk pigeonhole (hamming<=3 ⇒ some chunk equal), then exact
  *    hamming verify;
  *  - n-gram Jaccard: exact set similarity used as the verify stage.
  *
  * All hashing is seeded/constant so results are deterministic run-to-run.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct text with the surviving
    * (minimum) doc_id and the duplicate count. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("text")).as("text_hash"), col("keeper_id"), col("n_copies"))

  /** Distinct word n-gram shingles of `text`. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val cnt = greatest(size(toks) - lit(n - 1), lit(1))
    array_distinct(transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  // MinHash parameters: k = bands * rows hash functions h_i(x) = (a_i*x + b_i) mod P
  // over 31-bit base hashes; constants from a fixed seed for determinism.
  private val MinhashP = (1L << 61) - 1
  private def coeffs(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(seed)
    def draw() = math.abs(rnd.nextLong()) % ((1L << 31) - 1)
    (Seq.fill(k)(draw() + 1), Seq.fill(k)(draw()))
  }

  /** Per-document MinHash signature (array of k minima) over word
    * n-gram shingles. Narrow, codegen'd, no shuffle. */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 2): Column = {
    val (a, b) = coeffs(k, seed = 42L)
    val baseHashes = transform(shingles(text, shingleN), s => pmod(xxhash64(s), lit(1L << 31)))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(baseHashes, h =>
        pmod(element_at(typedLit(a), (i + 1).cast("int")) * h +
          element_at(typedLit(b), (i + 1).cast("int")), lit(MinhashP)))))
  }

  /** LSH candidate pairs: signatures banded (bands x rowsPerBand = k);
    * docs colliding in any band become a candidate pair, then each pair is
    * verified with (a) signature agreement estimate and (b) exact n-gram
    * Jaccard. Returns pairs with estJaccard and exact jaccard columns,
    * filtered to `threshold` on the EXACT value.
    */
  def minhashLsh(docs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                 shingleN: Int = 2, threshold: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    val sig = docs.select(col("doc_id"), col("text"),
      minhashSignature(col("text"), k, shingleN).as("sig"))
    // (doc_id, band_id, band_hash): one murmur hash per signature slice
    val banded = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), j =>
        struct(j.as("band_id"),
          hash(j, slice(col("sig"), j * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
            .as("band_hash")))).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("left_id"), col("r.doc_id").as("right_id"))
      .distinct()
    val sigOnly = sig.select(col("doc_id"), col("sig"), shingles(col("text"), shingleN).as("grams"))
    val ls = sigOnly.select(col("doc_id").as("left_id"), col("sig").as("lsig"), col("grams").as("lgrams"))
    val rs = sigOnly.select(col("doc_id").as("right_id"), col("sig").as("rsig"), col("grams").as("rgrams"))
    candidates.join(ls, "left_id").join(rs, "right_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("lsig"), col("rsig"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / lit(bands * rowsPerBand))
      .withColumn("jaccard",
        size(array_intersect(col("lgrams"), col("rgrams"))).cast("double") /
          size(array_union(col("lgrams"), col("rgrams"))))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("est_jaccard"), col("jaccard"))
  }

  /** 64-bit SimHash over word unigrams: per-bit vote of token hashes.
    * Token hashes are computed once per document, then folded 64 times —
    * all narrow per-row work.
    */
  def simhash(text: Column): Column = {
    val tokenHashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, i) => {
      val vote = aggregate(tokenHashes, lit(0L),
        (v, h) => v + when((call_function("shiftright", h, i).bitwiseAND(lit(1L))) === 1L, 1L).otherwise(-1L))
      acc + when(vote > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
    })
  }

  /** Per-document SimHash signatures plus the four 16-bit chunks used for
    * hamming-candidate banding. */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash(col("text")).as("simhash"))
      .withColumn("chunks", transform(sequence(lit(0), lit(3)), j =>
        call_function("shiftright", col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))))

  /** Near-dup pairs with hamming distance <= maxHamming (pigeonhole over
    * 16-bit chunks guarantees recall for maxHamming <= 3). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
        posexplode(col("chunks")).as(Seq("chunk_id", "chunk_val")))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r,
        col("l.chunk_id") === col("r.chunk_id") &&
        col("l.chunk_val") === col("r.chunk_val") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("left_id"), col("r.doc_id").as("right_id"),
        col("l.simhash").as("lsim"), col("r.simhash").as("rsim"))
      .distinct()
      .withColumn("hamming", bit_count(col("lsim").bitwiseXOR(col("rsim"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("left_id"), col("right_id"), col("hamming"))
  }

  /** Exact n-gram Jaccard for consecutive doc-id pairs — the verify
    * primitive exposed as its own oracle-checkable operator (character
    * n-grams here; word shingles feed the MinHash path). */
  def ngramJaccardConsecutive(docs: DataFrame, n: Int = 3): DataFrame = {
    val gramsCol = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - lit(n - 1), lit(1))),
      i => col("text").substr(i, lit(n))))
    val g = docs.select(col("doc_id"), gramsCol.as("grams"))
    val l = g.as("l"); val r = g.as("r")
    l.join(r, col("r.doc_id") === col("l.doc_id") + 1)
      .select(col("l.doc_id").as("left_id"), col("r.doc_id").as("right_id"),
        (size(array_intersect(col("l.grams"), col("r.grams"))).cast("double") /
          size(array_distinct(concat(col("l.grams"), col("r.grams"))))).as("jaccard"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that bins documents into
  * fixed token-capacity sequences (context windows) so no GPU batch pads.
  *
  * Packing is inherently sequential (each placement depends on the fill
  * state the previous one left), so it cannot be a window function. The
  * distributed shape: shard the corpus by (source, doc_id % shards) —
  * deterministic, content-independent — and run greedy next-fit
  * INSIDE each shard, ordered by doc_id. Each shard is independent, so
  * parallelism = #sources * shards; at 100 TB you raise `shards` until a
  * shard's doc-id/token list fits an executor (ids and lengths only —
  * the text itself never enters the group), and the per-shard state is
  * two longs. Next-fit (not first-fit) keeps per-shard state O(1) and is
  * the standard choice when the stream is unordered anyway.
  */
object Packing {

  private[graft] case class Sized(source: String, bucket: Long, doc_id: Long,
                                  n_tokens: Long)
  private[graft] case class Placed(doc_id: Long, source: String, bucket: Long,
                                   seq_id: Long, tok_offset: Long, n_tokens: Long)

  /** Greedy next-fit packing of `docs` (needs doc_id, source, text) into
    * sequences of `capacity` tokens. A document longer than `capacity`
    * gets a sequence of its own (callers chunk first — see
    * TextAnalysis.chunkDocuments — if overflow matters). Returns one row
    * per document: its sequence id within the shard and token offset
    * within the sequence. */
  def packSequences(docs: DataFrame, capacity: Int = 512,
                    shards: Int = 8): DataFrame = {
    require(shards > 0, "shards must be positive")
    packSized(docs.select(
      col("source"),
      pmod(col("doc_id"), lit(shards.toLong)).as("bucket"),
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens")), capacity)
  }

  /** Packing over CALLER-PROVIDED lengths — the composition entry point
    * (e.g. pack by BPE piece counts instead of whitespace tokens).
    * `sized` must carry (source, bucket, doc_id, n_tokens); the same
    * per-(source, bucket) next-fit state machine applies. */
  def packSized(sizedDf: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = sizedDf.sparkSession
    import spark.implicits._
    val sized: Dataset[Sized] = sizedDf
      .select(col("source"), col("bucket").cast("long"), col("doc_id"),
        col("n_tokens").cast("long"))
      .as[Sized]
    sized.groupByKey(d => (d.source, d.bucket))
      .flatMapGroups { (key: (String, Long), it: Iterator[Sized]) =>
        val (src, bkt) = key
        // only (doc_id, n_tokens) pairs are buffered — the shard count
        // bounds this, and the text column was pruned at the scan
        val ordered = it.toArray.sortBy(_.doc_id)
        var seq = 0L
        var fill = 0L
        var started = false
        ordered.iterator.map { d =>
          if (!started || fill + d.n_tokens > capacity) {
            if (started) seq += 1
            started = true
            fill = 0L
          }
          val off = fill
          fill += d.n_tokens
          Placed(d.doc_id, src, bkt, seq, off, d.n_tokens)
        }
      }
      .toDF()
  }
}

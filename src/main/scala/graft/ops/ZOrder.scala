package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data skipping.
  *
  * A table range-partitioned and sorted by the bit-interleaved key keeps
  * rows that are close in EVERY interleaved dimension inside the same
  * files and row groups, so parquet min/max stats prune scans for
  * predicates on any of them — the standard lakehouse layout trick for
  * multi-column filter workloads where a single-column sort only helps
  * one of them.
  *
  * The interleave is plain integer arithmetic (shifts, masks, adds) —
  * codegen-friendly on the Spark side and byte-for-byte replayable in
  * the SQL oracle. Keys must be non-negative and < 2^bits (callers
  * bound them with pmod); k*bits <= 62 keeps the code in a signed long,
  * so more dimensions trade per-dimension resolution (2-D: 31 bits max,
  * 3-D: 20, 4-D: 15) — resolution beyond the file count is wasted
  * anyway, since skipping happens at file/row-group granularity.
  */
object ZOrder {

  /** Bit-interleaved code of k bounded non-negative keys: bit i of
    * keys(j) lands at position i*k + j, so low-order bits of every
    * dimension share the low-order code bits — the locality property. */
  def zValueN(keys: Seq[Column], bits: Int): Column = {
    val k = keys.size
    require(k >= 2, "interleave needs at least two key columns")
    require(bits > 0 && k * bits <= 62, "k*bits must fit a signed long")
    (0 until bits).flatMap { i =>
      keys.zipWithIndex.map { case (c, j) =>
        shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (i * k + j))
      }
    }.reduce(_ + _)
  }

  /** Two-key form (bit i of `a` at 2i, of `b` at 2i+1) — the common
    * case, and the layout q50 pins. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data skipping.
  *
  * A table range-partitioned and sorted by the bit-interleaved key keeps
  * rows that are close in BOTH dimensions inside the same files and row
  * groups, so parquet min/max stats prune scans for predicates on either
  * dimension — the standard lakehouse layout trick for two-column filter
  * workloads where a single-column sort only helps one of them.
  *
  * The interleave is plain integer arithmetic (shifts, masks, adds) —
  * codegen-friendly on the Spark side and byte-for-byte replayable in
  * the SQL oracle. Keys must be non-negative and < 2^bits (callers
  * bound them with pmod); 2*bits <= 62 keeps the code in a signed long.
  */
object ZOrder {

  /** Bit-interleaved code of two bounded non-negative keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && 2 * bits <= 62, "2*bits must fit a signed long")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}

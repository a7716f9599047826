package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys. Z-order (Morton) interleaving maps multi-column
  * locality onto one sort key: writing a table range-partitioned and
  * sorted by z(a, b) clusters rows so a predicate on EITHER column prunes
  * file/row-group zone maps — the layout trick behind Delta/Iceberg
  * Z-ORDER, expressed here as a plain column so `repartitionByRange(z)
  * .sortWithinPartitions(z)` + parquet min/max stats do the same job.
  *
  * Pure bitwise column arithmetic (shift/and/or chains, whole-stage
  * codegen'd; no UDF) — and exactly replayable in SQL, which q106 pins.
  */
object Layout {
  /** Interleave the low `bits` bits of two non-negative longs: bit j of
    * `a` lands at position 2j, bit j of `b` at 2j+1. `bits` <= 31.
    */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column =
    interleaveBitsN(Seq(a, b), bits)

  /** N-column Morton key: bit j of column i lands at position n·j + i.
    * n · bits must fit a non-negative long (<= 62).
    */
  def interleaveBitsN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, "need at least two columns")
    require(bits >= 1 && n * bits <= 62, s"$n x $bits bits overflow a long")
    (for (j <- 0 until bits; (c, i) <- cols.zipWithIndex)
      yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), n * j + i))
      .reduce(_ bitwiseOR _)
  }

  /** The identical arithmetic as portable SQL (for oracles/docs). */
  def interleaveBitsSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"((($a >> $j) & 1) << ${2 * j}) | ((($b >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " | ", ")")
}

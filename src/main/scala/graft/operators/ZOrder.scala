package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D Z-ORDER clustering — the multi-dimension generalization of the
  * range-clustered layout (`docs_layout_range` is the 1-D special case):
  * interleave the bits of two bucket keys into one Morton code, then
  * range-cluster files on it. A file's Z-value interval bounds BOTH
  * dimensions, so parquet footer min/max statistics skip files for
  * predicates on EITHER column (or a 2-D box) — the standard layout for
  * "query by time AND by size" scans over a 100 TB corpus, where a 1-D
  * sort only ever prunes its leading column.
  *
  * The interleave is a pure bit expression (32 shift/mask terms, codegen
  * whole-stage) — no UDF, engine-portable.
  */
object ZOrder {

  /** bits per dimension (Z width = 2·bits ≤ 32 — far from the sign bit). */
  val Bits = 16

  /** Morton interleave of the low [[Bits]] bits of `a` (even positions)
    * and `b` (odd positions). Inputs are masked to [[Bits]] bits. */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a.cast("long"), i)
        .bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b.cast("long"), i)
        .bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** Write `df` range-clustered on the Z-value of (`dimA`, `dimB`) into
    * `out` as `files` files; the z column does not survive the write. */
  def writeClustered(df: DataFrame, dimA: Column, dimB: Column,
                     out: String, files: Int): Unit = {
    df.withColumn("__z",
        interleave(least(dimA, lit((1L << Bits) - 1)),
          pmod(dimB, lit(1L << Bits))))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Proves the property `docs_layout_z` relies on: Z-order clustering
  * bounds EVERY file in BOTH dimensions, so footer min/max statistics
  * prune files for predicates on either column — where the 1-D range
  * layout only ever prunes its leading sort column. */
class ZOrderLayoutSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("z-clustered files prune on both dimensions") {
    val out = Files.createTempDirectory("graft_z_spec").toString
    ZOrder.writeClustered(Tables.documents(spark, "/root/testdata/sf0.01"),
      col("n_chars"), col("doc_id"), out, 8)
    val files = spark.read.parquet(out).inputFiles
    assert(files.length >= 4, "need several files to prove pruning")
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("n_chars")), max(col("n_chars")),
          min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // NARROW low-band slice per dimension (⅛..¼ of the global range): a
    // Z layout's files are bounded to power-of-two-ish boxes per dim, so
    // a slice inside the lower quarter must exclude the upper-half files
    // on that dim. (A mid-range band would straddle the most significant
    // bit split and touch every box — the wrong probe for Morton order.)
    def lowBand(lo: Long, hi: Long): (Long, Long) =
      (lo + (hi - lo) / 8, lo + (hi - lo) / 4)
    val (cLo, cHi) = lowBand(stats.map(_._1).min, stats.map(_._2).max)
    val (dLo, dHi) = lowBand(stats.map(_._3).min, stats.map(_._4).max)
    val cHit = stats.count { case (mn, mx, _, _) => mx >= cLo && mn <= cHi }
    val dHit = stats.count { case (_, _, mn, mx) => mx >= dLo && mn <= dHi }
    assert(cHit < files.length,
      s"n_chars slice should skip files: $cHit of ${files.length} hit")
    assert(dHit < files.length,
      s"doc_id slice should skip files: $dHit of ${files.length} hit")
    // and the 2-D box needs at most what either 1-D slice needs
    val boxHit = stats.count { case (cmn, cmx, dmn, dmx) =>
      cmx >= cLo && cmn <= cHi && dmx >= dLo && dmn <= dHi
    }
    assert(boxHit <= math.min(cHit, dHit), "box pruning can't be worse than 1-D")
  }
}

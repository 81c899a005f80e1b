package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[BloomDedup.bloomRetract]] — the counting-Bloom takedown. The counting
  * cells form a group under cell-wise +, so decrementing the removed
  * batch's probes must be EXACTLY the filter rebuilt on corpus∖removed
  * (graded in-query by `retract_exact`), and a removed doc re-submitted
  * must clear admission (at 12 docs against 2¹⁶ bits the FP probability is
  * ~0, so "not flagged" is deterministic in practice). */
class BloomRetractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private val corpus = docsDf((0L until 12L).map(i =>
    (i, if (i % 2 == 0) "en" else "de", s"unique corpus document $i body")))

  test("decremented cells equal the from-scratch rebuild; removed docs clear admission") {
    val removed = corpus.filter("doc_id % 3 = 0") // docs 0,3,6,9
    // batch: one removed doc re-submitted, one surviving dup, one new doc
    val batch = docsDf(Seq(
      (100L, "en", "unique corpus document 0 body"), // removed → must pass
      (101L, "en", "unique corpus document 1 body"), // survivor → true dup
      (102L, "en", "never seen before")))            // new → must pass
    val rep = BloomDedup.bloomRetract(corpus, removed, batch)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = rep("en")
    assert(en.getAs[Boolean]("retract_exact"),
      "decremented cells differ from the from-scratch counting filter")
    assert(en.getAs[Long]("n_batch") == 3L)
    // only the surviving dup may be flagged: the removed doc's probes were
    // decremented away, the new doc never set them
    assert(en.getAs[Long]("n_true_dup") == 1L)
    assert(en.getAs[Long]("n_flagged") == 1L)
    assert(en.getAs[Long]("n_false_pos") == 0L)
  }

  test("empty retraction is the identity: report matches plain bloomAdmit") {
    val none = corpus.filter("doc_id < 0")
    val batch = docsDf(Seq(
      (200L, "en", "unique corpus document 2 body"),
      (201L, "de", "fresh arrival")))
    val got = BloomDedup.bloomRetract(corpus, none, batch)
      .drop("retract_exact")
    val want = BloomDedup.bloomAdmit(corpus, batch)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}

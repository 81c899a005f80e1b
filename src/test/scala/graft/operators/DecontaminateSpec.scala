package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral tests for benchmark decontamination on handcrafted documents
  * with known n-gram overlap structure (eval membership is doc_id % evalMod
  * == 0, so ids are chosen to land on either side). */
class DecontaminateSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // 12 tokens, so it contains 5 distinct 8-gram shingles
  private val evalText = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliett kilo lima"

  private val docs = Seq(
    (0L, evalText), // the eval document (0 % 7 == 0)
    // verbatim copy of the eval doc -> every shingle hits
    (1L, evalText),
    // contains one full 8-gram of the eval doc inside fresh context
    (2L, "intro words alpha bravo charlie delta echo foxtrot golf hotel " +
      "closing remarks here"),
    // shares vocabulary but never 8 consecutive tokens
    (3L, "alpha bravo charlie something delta echo foxtrot other golf " +
      "hotel india filler juliett kilo lima"),
    // entirely disjoint
    (4L, "the quick brown fox jumps over the lazy dog tonight again soon")
  ).toDF("doc_id", "text")

  test("verbatim and embedded n-gram leaks flag; paraphrase and clean do not") {
    val got = Decontaminate.flag(docs, evalMod = 7).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "eval doc excluded from output")
    assert(got(1L) == (5L, true), s"verbatim copy: all 5 shingles hit, got ${got(1L)}")
    assert(got(2L)._1 >= 1L && got(2L)._2, "embedded 8-gram flags")
    assert(got(3L) == (0L, false), "no 8 consecutive shared tokens -> clean")
    assert(got(4L) == (0L, false), "disjoint text -> clean")
  }
}

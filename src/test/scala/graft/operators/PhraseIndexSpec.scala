package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Phrase search vs a brute-force sliding-window scan, repeated-term
  * phrases, zero-hit rows, and the partition-pruned read of the persisted
  * term-bucketed index. */
class PhraseIndexSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "a cat sat; the cat sat on a hat!"),
    (2L, "mat mat mat"),
    (3L, "CAT sat"),
    (4L, "entirely unrelated words here")
  ).toDF("doc_id", "text")

  private val phrases = Seq(
    (0L, "cat sat"),
    (1L, "the cat sat on"),
    (2L, "mat mat"),      // repeated term: overlapping matches count each start
    (3L, "dog barks")     // zero hits
  ).toDF("phrase_id", "phrase")

  /** brute force: all (phrase, doc, start) via token sliding windows. */
  private def brute(): Set[(Long, Long, Long)] = {
    def toks(s: String) = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toVector
    val ds = docs.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    val ps = phrases.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    (for {
      (pid, pt) <- ps
      (did, dt) <- ds
      s <- 0 to dt.length - pt.length
      if dt.slice(s, s + pt.length) == pt
    } yield (pid, did, s.toLong)).toSet
  }

  private def got(m: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches equals the brute-force sliding-window scan") {
    assert(got(PhraseIndex.matches(docs, phrases)) == brute())
    // sanity on the fixture itself: overlapping repeated-term matches exist
    // ("mat mat mat" holds "mat mat" at starts 0 AND 1)
    assert(brute().count { case (pid, did, _) => pid == 2L && did == 2L } == 2)
  }

  test("indexed matches equal the one-shot path and the scan is DPP-pruned") {
    val res = PhraseIndex.indexedMatches(docs, phrases)
    assert(got(res) == brute())
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no partition pruning on the phrase-index scan:\n${plan.take(2000)}")
  }

  test("phraseStats keeps a row for the zero-hit phrase") {
    val st = PhraseIndex.phraseStats(PhraseIndex.matches(docs, phrases), phrases)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(st.keySet == Set(0L, 1L, 2L, 3L))
    assert(st(3L) == (0L, 0L, -1L))
    assert(st(0L)._1 == 3 && st(0L)._2 == 4) // "cat sat": docs 0,1(x2),3
    assert(st(2L) == (1L, 2L, 2L))           // overlapping starts both count
  }
}

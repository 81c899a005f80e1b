package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Pins [[TextOps.bpeStep]]'s greedy merge count, especially the
  * self-overlapping pair case (…aaa… under pair (a,a)), where
  * left-to-right greedy takes ⌊k/2⌋ merges from a run of k tokens. */
class BpeStepSpec extends AnyFunSuite {

  import spark.implicits._

  test("self-overlapping pair merges greedily (floor(run/2) per run)") {
    val docs = Seq(
      (1L, "x a a a a a y"), // run of 5 a's -> 2 merges
      (2L, "a a a"),         // run of 3 -> 1 merge
      (3L, "p q r s")        // no a-pair at all -> 0
    ).toDF("doc_id", "text")
    val got = TextOps.bpeStep(docs).collect()
      .map { case Row(id: Long, a: String, b: String, pn: Long,
        nb: Long, nm: Long, na: Long) => id -> ((a, b, pn, nb, nm, na)) }
      .toMap
    // global top pair is (a,a): 4 occurrences in doc 1 + 2 in doc 2
    assert(got(1L) === (("a", "a", 6L, 7L, 2L, 5L)))
    assert(got(2L) === (("a", "a", 6L, 3L, 1L, 2L)))
    assert(got(3L) === (("a", "a", 6L, 4L, 0L, 4L)))
  }

  test("distinct pair merges count every occurrence") {
    val docs = Seq(
      (1L, "u v u v u v"), // (u,v) x3, non-overlapping by construction
      (2L, "v u v")        // (u,v) x1
    ).toDF("doc_id", "text")
    val got = TextOps.bpeStep(docs).collect()
      .map { case Row(id: Long, a: String, b: String, pn: Long,
        nb: Long, nm: Long, na: Long) => id -> ((a, b, pn, nb, nm, na)) }
      .toMap
    assert(got(1L) === (("u", "v", 4L, 6L, 3L, 3L)))
    assert(got(2L) === (("u", "v", 4L, 3L, 1L, 2L)))
  }

  test("bpeStep2 rewrites the stream (overlap consumed) and recounts for merge 2") {
    // tokens [x,x,x,y,y]: top1 = (x,x) n=2; greedy merges j=1, consumes
    // j=2 -> stream [xx, x, y, y]; new pairs (xx,x),(x,y),(y,y) all 1 ->
    // top2 tie-break lexicographic = (x,y)
    val docs = Seq((1L, "x x x y y")).toDF("doc_id", "text")
    val r = TextOps.bpeStep2(docs).head()
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("x", "x", 2L)))
    assert((r.getString(3), r.getString(4), r.getLong(5)) === (("x", "y", 1L)))
  }

  test("bpeStep2 merged token participates in merge-2 counts") {
    // [p,q,p,q]: top1 = (p,q) n=2, both merged (distinct-pair islands are
    // singletons) -> stream [pq, pq]; merge 2 = (pq, pq) n=1
    val docs = Seq((1L, "p q p q")).toDF("doc_id", "text")
    val r = TextOps.bpeStep2(docs).head()
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("p", "q", 2L)))
    assert((r.getString(3), r.getString(4), r.getLong(5)) === (("pq", "pq", 1L)))
  }

  test("bpeTrain's first two merges match bpeStep/bpeStep2 on the fixture corpus") {
    // the trainer loop and the independently-graded one- and two-step
    // queries must agree where they overlap — the same composition proof
    // kmeansTrain has against kmeansStep
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = TextOps.bpeTrain(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(trained.size === 3)
    val s1 = TextOps.bpeStep(docs).select("a", "b", "pair_n").head()
    assert(trained(1L) === ((s1.getString(0), s1.getString(1), s1.getLong(2))))
    val s2 = TextOps.bpeStep2(docs).head()
    assert(trained(2L) === ((s2.getString(3), s2.getString(4), s2.getLong(5))))
  }

  test("bpeTrain re-merges into longer tokens on an overlap-heavy doc") {
    // [c,c,c,c]: it1 (c,c) n=3 -> greedy [cc, cc]; it2 (cc,cc) n=1 ->
    // [cccc]; it3 has no pairs left anywhere -> trainer must still emit
    // a row for the remaining corpus (doc 2 keeps a (d,e) pair alive)
    val docs = Seq((1L, "c c c c"), (2L, "d e")).toDF("doc_id", "text")
    val t = TextOps.bpeTrain(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(t(1L) === (("c", "c", 3L)))
    assert(t(2L) === (("cc", "cc", 1L)))
    assert(t(3L) === (("d", "e", 1L)))
  }
}

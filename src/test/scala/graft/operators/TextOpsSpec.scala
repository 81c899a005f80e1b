package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral tests for the repetition quality signals on documents with
  * known repetition structure (the fixtures are near-uniform token draws,
  * so both signals sit low there — these pin the filter actually firing).
  */
class TextOpsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    // the degenerate SEO-spam shape: one token over and over
    (0L, "buy buy buy buy buy buy buy buy buy buy"),
    // looped boilerplate: a clean sentence repeated 4 times — every bigram
    // after the first pass is a duplicate
    (1L, Seq.fill(4)("click here to subscribe now").mkString(" ")),
    // normal prose-like variety (most frequent token 2/13 = 0.15)
    (2L, "a quick brown fox jumps over the lazy dog near a river bank"),
    (3L, "x"), // single token: one whole-stream bigram, dup frac 0
    (4L, "")   // empty: zero tokens, both signals 0 (length filters reject it)
  ).toDF("doc_id", "text")

  test("repetition signals flag repeated-token and looped-boilerplate docs") {
    val got = TextOps.repetition(docs).collect().map { r =>
      r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    }.toMap
    val (top0, _, keep0) = got(0L)
    assert(top0 == 1.0 && !keep0, "all-same-token doc must be rejected")
    val (_, dup1, keep1) = got(1L)
    assert(dup1 > 0.5 && !keep1, "looped boilerplate must be rejected")
    val (top2, dup2, keep2) = got(2L)
    assert(top2 < 0.25 && dup2 == 0.0 && keep2, "varied prose passes")
  }

  test("chunking: overlap carried across boundaries, short tail kept, empty doc skipped") {
    // 10 tokens, width 4, overlap 1 -> stride 3 -> starts 0,3,6,9:
    // chunks [t0..t3] [t3..t6] [t6..t9] [t9] — boundary tokens shared,
    // final chunk short, never empty
    val d = Seq((0L, (1 to 10).map(i => s"t$i").mkString(" ")), (1L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.chunk(d, width = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 4L, (0L, 1L) -> 4L, (0L, 2L) -> 4L,
      (0L, 3L) -> 1L), s"unexpected chunk grid: $got")
  }

  test("chunk geometry matches the reference grid for every doc length") {
    // reference: starts 0, stride, 2*stride, ... < n; chunk k holds
    // min(width, n - start) tokens; n = 0 emits nothing
    for (overlap <- Seq(0, 3)) {
      val width = 8
      val stride = width - overlap
      val docs = (0 to 40).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val got = TextOps.chunk(docs, width, overlap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = (for {
        n <- 0 to 40
        if n >= 1
        (start, k) <- (0 until n by stride).zipWithIndex
      } yield (n.toLong, k.toLong) -> math.min(width, n - start).toLong).toMap
      assert(got == expected, s"grid mismatch at overlap=$overlap")
    }
  }

  test("repetition edges: single-token and empty docs don't divide by zero") {
    val got = TextOps.repetition(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
    }.toMap
    assert(got(3L) == ((1L, 1.0, 0.0)), "single token: top frac 1, no dup bigrams")
    assert(got(4L) == ((0L, 0.0, 0.0)), "empty doc: all zeros")
  }

  test("piiScrub: counts and redacted lengths on known strings") {
    val pii = Seq(
      (0L, "en", "mail me at bob99@corp.com today"),         // 1 email
      (1L, "en", "from 192.168.0.1 and 10.0.0.2 came"),      // 2 ips
      (2L, "de", "call 555-1234 or 555-9999 now"),           // 2 phones
      (3L, "de", "clean text with no pii at all"),           // nothing
      (4L, "en", "a@b.com and 1.2.3.4 and 555-0000"))        // one of each
      .toDF("doc_id", "lang", "text")
    val got = TextOps.piiScrub(pii).collect()
      .map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) = {
      val r = got(id)
      (r.getAs[Long]("n_email"), r.getAs[Long]("n_ip"), r.getAs[Long]("n_phone"))
    }
    assert(counts(0L) == ((1L, 0L, 0L)))
    assert(counts(1L) == ((0L, 2L, 0L)))
    assert(counts(2L) == ((0L, 0L, 2L)))
    assert(counts(3L) == ((0L, 0L, 0L)))
    assert(counts(4L) == ((1L, 1L, 1L)))
    // redaction delta: "bob99@corp.com" (14) -> "<EMAIL>" (7) = 7 chars
    assert(got(0L).getAs[Long]("len_raw") - got(0L).getAs[Long]("len_scrubbed") == 7L)
    // the clean doc is untouched
    assert(got(3L).getAs[Long]("len_raw") == got(3L).getAs[Long]("len_scrubbed"))
  }

  test("winnow: the MOSS guarantee — any shared run of >= w+k-1 chars " +
       "yields a shared fingerprint; short/degenerate docs still winnow") {
    import org.apache.spark.sql.functions.col
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val wdocs = Seq(
      (0L, s"alpha beta gamma $shared delta epsilon"),
      (1L, s"completely different prefix text here $shared and a suffix"),
      (2L, "nothing in common with anyone at all zzz qqq www"),
      (3L, "tiny"), // shorter than one k-gram: one whole-string gram
      (4L, "exactly eight"), // shorter than one window: whole-array window
      // non-BMP (surrogate-pair) chars: gram boundaries must count CODE
      // POINTS as Spark/DuckDB substr do — a UTF-16 walk shifts every gram
      // after the first emoji and splits pairs into replacement bytes
      // (ADVICE r10); this row diverges from the column form if the kernel
      // ever regresses to String indexing
      (5L, "emoji 🌍🌍 mixed 🚀 through the text here")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnow(wdocs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // guarantee: docs 0 and 1 share a 52-char run >= 23 = WinnowK+WinnowW-1
    assert(fps(0L).toSet.intersect(fps(1L).toSet).nonEmpty,
      "shared >=23-char run produced no shared fingerprint")
    // unrelated doc shares nothing with either
    assert(fps(2L).toSet.intersect(fps(0L).toSet).isEmpty)
    assert(fps(2L).toSet.intersect(fps(1L).toSet).isEmpty)
    // degenerate docs produce exactly one fingerprint (one gram / window)
    assert(fps(3L).length == 1 && fps(4L).nonEmpty)
    // fingerprint arrays are ascending distinct (the kernel contract),
    // and the global minimum k-gram hash is always selected (its window
    // minimum is itself)
    fps.values.foreach { a =>
      assert(a == a.distinct.sorted, s"fps not ascending distinct: $a")
      assert(a.nonEmpty)
    }
    // the kernel matches the interpreted column formulation bit-exactly
    // on the whole fixture slice (the formulation the oracle mirrors)
    val t = TextOps.normText(col("text"))
    val k = graft.operators.TextOps.WinnowK
    val w = graft.operators.TextOps.WinnowW
    import org.apache.spark.sql.functions._
    val h = transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => graft.functions.VecOps.hash60(t.substr(i, lit(k))))
    val colForm = wdocs.select(col("doc_id"), h.as("h"))
      .select(col("doc_id"), least(lit(w), size(col("h"))).as("wl"), col("h"))
      .select(col("doc_id"), array_sort(array_distinct(transform(
        sequence(lit(1), size(col("h")) - col("wl") + 1),
        i => array_min(slice(col("h"), i, col("wl")))))).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(colForm == fps, "native kernel diverged from the column form")
  }
}

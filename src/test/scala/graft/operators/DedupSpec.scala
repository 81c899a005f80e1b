package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral tests for the dedup pillar on handcrafted documents with
  * known duplicate structure (the fixtures only have accidental dups). */
class DedupSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest before sunset tonight"
  private val docs = Seq(
    (0L, base),
    (1L, "  THE   quick brown fox jumps over the lazy dog and then runs far " +
      "away into the deep green forest before sunset tonight"), // ws/case only
    (2L, base.replace("lazy", "sleepy")), // one-word near-dup
    (3L, "completely unrelated text about spark query engines and columnar " +
      "storage formats with vectorized execution pipelines everywhere"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("exact clustering groups whitespace/case variants") {
    val got = Dedup.exactClusters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (0L, 2L) && got(1L) == (0L, 2L), "0 and 1 share a cluster")
    assert(got(2L)._2 == 1L && got(3L)._2 == 1L && got(4L)._2 == 1L)
  }

  test("minhash signatures: identical for exact dups, mostly equal for near-dups") {
    val sig = Dedup.minhashSig(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(0L) == sig(1L), "normalized dups share the signature")
    val nearMatches = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(nearMatches >= Dedup.K / 2, s"near-dup only matched $nearMatches/${Dedup.K}")
    val farMatches = sig(0L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(farMatches <= Dedup.K / 4, s"unrelated docs matched $farMatches/${Dedup.K}")
  }

  test("minhash LSH pairs find the duplicate cluster, never unrelated docs") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: zero hamming for dups, banded pairs exclude unrelated docs") {
    val sig = Dedup.simhashSig(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    val pairs = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 0L)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ngram jaccard verifies LSH candidates with exact similarity") {
    val got = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((0L, 1L)) == 1.0)
    got.get((0L, 2L)).foreach(j => assert(j > 0.3 && j < 1.0))
  }

  test("capped minhash pairs: adversarial all-identical corpus stays linear") {
    // 100 bit-identical docs → every band bucket holds all 100 docs. The
    // uncapped plan would emit 4950 pairs; the cap routes hot buckets to a
    // spanning star: exactly the 99 (0, b) pairs, cluster still connected.
    val n = 100L
    val dup = spark.range(n).select(col("id").as("doc_id"), lit(base).as("text"))
    val rows = Dedup.minhashPairsCapped(dup, cap = 16).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L until n).map(b => (0L, b)).toSet,
      s"expected the 99-edge star from doc 0, got ${rows.length} pairs")
    assert(rows.forall(_.getDouble(2) == 1.0), "identical docs est_jaccard = 1")
  }

  test("capped minhash pairs: cold buckets keep exact all-pairs semantics") {
    val uncapped = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.minhashPairsCapped(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == uncapped, "below-cap buckets must be unchanged")
  }

  test("lang_id calls the English function-word profile") {
    val got = TextOps.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en" && got(3L) == "en")
  }

  test("incremental dedup: batch near-dups of the corpus rejected, fresh docs admitted") {
    val existing = Seq(
      (0L, base, "en"),
      (2L, "completely unrelated text about spark query engines and " +
        "columnar storage formats with vectorized execution", "en")
    ).toDF("doc_id", "text", "lang")
    val batch = Seq(
      // ws/case variant of corpus doc 0: identical signature → est 1.0 → dup
      (1L, "  THE   quick brown fox jumps over the lazy dog and then runs " +
        "far away into the deep green forest before sunset tonight", "en"),
      // genuinely new content → no band collision above threshold → admitted
      (3L, "fresh document describing streaming watermarks checkpoints and " +
        "stateful session windows in structured pipelines", "en")
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.incrementalDedup(batch, existing).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_new") == 2 && r.getAs[Long]("n_dup") == 1 &&
      r.getAs[Long]("n_admitted") == 1,
      s"expected 2 new / 1 dup / 1 admitted, got $r")
  }

  test("weighted tf pairs: order-invariant, exact integer sums, disjoint docs unpaired") {
    // docs 10 and 11 have IDENTICAL token-count vectors ({a:2, b:1, c:1})
    // in different orders → identical expanded multisets → identical
    // signatures → guaranteed band collision, and J_w = 1 with
    // w_inter = w_union = 4. Doc 12 is disjoint → no pair survives.
    val wdocs = Seq(
      (10L, "alpha beta alpha gamma"),
      (11L, "alpha alpha gamma beta"),
      (12L, "delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val got = Dedup.weightedTfPairs(wdocs).collect()
    assert(got.length == 1, s"expected exactly the (10,11) pair, got ${got.toSeq}")
    val r = got.head
    assert(r.getAs[Long]("doc_a") == 10L && r.getAs[Long]("doc_b") == 11L)
    assert(r.getAs[Long]("w_inter") == 4L && r.getAs[Long]("w_union") == 4L)
    assert(r.getAs[Double]("jw") == 1.0)
  }

  test("weighted tf pairs: repetition variants score below set-Jaccard") {
    // same VOCABULARY (set Jaccard 1.0) but doc 21 doubles every token:
    // J_w = 5/10 = 0.5 — kept by the integer threshold 2*w_inter >= w_union
    // exactly at the boundary. The docs must collide in a band for the
    // pair to surface; doubling preserves every (tok#1..#n) element of the
    // original, but minima can come from the new elements, so assert only
    // IF the pair surfaced its sums are exact.
    val wdocs = Seq(
      (20L, "red green blue white black"),
      (21L, "red red green green blue blue white white black black")
    ).toDF("doc_id", "text")
    val got = Dedup.weightedTfPairs(wdocs).collect()
    for (r <- got) {
      assert(r.getAs[Long]("w_inter") == 5L && r.getAs[Long]("w_union") == 10L)
      assert(r.getAs[Double]("jw") == 0.5)
    }
  }
}

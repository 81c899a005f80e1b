package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.NativeExprs

/** Prefix-filter set-similarity join vs brute-force all-pairs Jaccard:
  * the COMPLETENESS guarantee is the operator's reason to exist (LSH can
  * miss; this must not), so the property test compares against every
  * pair, on a corpus built to have near-dups at the threshold boundary. */
class SsjoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(7)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")

  // 60 base docs + mutated copies (drop/replace a few tokens) so pair
  // similarities cluster around the 0.7 threshold from both sides
  private val docsSeq: Seq[(Long, String)] = {
    val base = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val mutated = base.take(30).map { case (id, text) =>
      val toks = text.split(" ").toBuffer
      val nEdits = 1 + rnd.nextInt(3)
      for (_ <- 0 until nEdits)
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      (id + 1000L, toks.mkString(" "))
    }
    base ++ mutated
  }

  private def shingleSet(text: String): Set[Long] = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    val shingles =
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toVector
      else Vector(toks.mkString(" "))
    shingles.map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      graft.functions.SketchKernel.hex60(md.digest(s.getBytes("UTF-8")))
    }.toSet
  }

  test("ssjoin equals brute-force all-pairs at tau = 0.7") {
    val sets = docsSeq.map { case (id, t) => id -> shingleSet(t) }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size
      if 1000L * i >= 700L * (sa.size + sb.size - i)
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must produce threshold-crossing pairs")

    val got = Dedup.ssjoinPairs(docsSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("jaccard values are exact against the set arithmetic") {
    val sets = docsSeq.map { case (id, t) => id -> shingleSet(t) }.toMap
    val got = Dedup.ssjoinPairs(docsSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    for (((a, b), j) <- got) {
      val i = (sets(a) & sets(b)).size.toDouble
      val u = sets(a).size + sets(b).size - i
      assert(j == math.floor(i / u * 1e4 + 0.5) / 1e4, s"($a, $b)")
    }
  }

  test("prefix keeps each set's rarest tokens (short sets keep all)") {
    // a 1-shingle doc's prefix is the whole set: p = 1 - ceil(tau) + 1 = 1
    val tiny = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = Dedup.ssjoinPairs(tiny).collect()
    assert(got.length == 1 && got.head.getDouble(2) == 1.0)
  }
}

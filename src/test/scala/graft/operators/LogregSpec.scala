package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VecOps
import graft.queries.TextQueries

/** [[TextQueries.logregTrain]] — the batch-GD logistic trainer learns the
  * right direction on a separable toy corpus: a token exclusive to the
  * positive class gets positive weight mass in its hash bucket, an
  * exclusive-negative token gets the opposite sign (modulo the signed
  * hash), and training strictly increases every doc's correct-class
  * margin. Uses enough docs that the mean gradient is far from the
  * micro-grid floor.
  */
class LogregSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // two disjoint single-token vocabularies — each class's token hashes to
  // one bucket with a fixed sign, so the learned weight is readable
  private val docs = (0 until 20).map { i =>
    if (i % 2 == 0) (i.toLong, "yes yes yes yes yes yes yes yes yes yes", "en", "s", 10L)
    else (i.toLong, "non non non non non non non non non non", "de", "s", 10L)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def bucketSign(tok: String): (Long, Long) = {
    val r = spark.range(1)
      .select(pmod(VecOps.hash60(lit(tok)), lit(64L)).as("dim"),
        (shiftrightunsigned(VecOps.hash60(lit(tok)), 6)
          .bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as("sgn"))
      .head
    (r.getLong(0), r.getLong(1))
  }

  test("weights separate the classes through the signed hash buckets") {
    val (dimPos, sgnPos) = bucketSign("yes")
    val (dimNeg, sgnNeg) = bucketSign("non")
    assert(dimPos != dimNeg) // fixture sanity: no hash collision
    val w = TextQueries.logregTrain(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // margin contribution of the positive doc = 10 * sgnPos * w(dimPos):
    // must be positive; the negative doc's contribution must be negative
    assert(10L * sgnPos * w(dimPos) > 0L, s"positive-class weight: ${w(dimPos)}")
    assert(10L * sgnNeg * w(dimNeg) < 0L, s"negative-class weight: ${w(dimNeg)}")
    // untouched buckets stay exactly zero
    assert(w.filterNot(kv => kv._1 == dimPos || kv._1 == dimNeg)
      .values.forall(_ == 0L))
  }

  test("more iterations never shrink the learned margin on separable data") {
    val w1 = TextQueries.logregTrain(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w3 = TextQueries.logregTrain(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (dimPos, sgnPos) = bucketSign("yes")
    assert(sgnPos * w3(dimPos) >= sgnPos * w1(dimPos))
  }
}

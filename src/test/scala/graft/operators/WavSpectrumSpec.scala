package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Invariants of the integer-DFT audio spectrum:
  *
  *  - Bessel: the graded bin powers never exceed the frame's total
  *    spectral energy, p_dc + 2·p_mid + p_nyq ≤ n·Σv² (the quarter-rate
  *    bin's conjugate at 3N/4 carries equal power, hence the 2·; equality
  *    iff the signal lives entirely in the three bins). Cross-checked
  *    against [[Multimodal.wavFrames]]'s independent Σv² walk. The bound
  *    is an ORTHOGONALITY property, so it holds exactly for frames whose
  *    length is a multiple of 4 (every full FrameN frame); a ragged tail
  *    of 1 sample makes all three patterns the same vector and the sum
  *    triple-counts — the bins are still well-defined features there,
  *    just not an orthogonal decomposition.
  *  - Known signals land in the right bin: a constant frame is pure DC,
  *    a ±A alternation is pure Nyquist, a period-4 cosine is pure mid.
  */
class WavSpectrumSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("Bessel bound vs the independent frame-energy walk, every 4-aligned frame") {
    val docs = Tables.documents(spark, dir)
    val joined = Multimodal.wavSpectrum(docs)
      .join(Multimodal.wavFrames(docs), Seq("doc_id", "frame_id", "n_smp"))
      .filter(col("n_smp") % 4 === 0) // orthogonality needs 4 | n
    assert(joined.count() > 0, "no multiple-of-4 frames to check")
    val viol = joined.filter(
      col("p_dc") + lit(2L) * col("p_mid") + col("p_nyq") >
        col("n_smp") * col("sum_sq")).count()
    assert(viol == 0, s"$viol frames violate the Bessel bound")
  }

  // the three bins are exact on their own basis signals — computed through
  // the same per-frame fold the production path uses
  private def binPowers(samples: Seq[Long]): (Long, Long, Long) = {
    var (dc, nyq, mre, mim) = (0L, 0L, 0L, 0L)
    samples.zipWithIndex.foreach { case (v, j) =>
      dc += v
      nyq += (if ((j & 1) == 0) v else -v)
      (j & 3) match {
        case 0 => mre += v
        case 1 => mim += v
        case 2 => mre -= v
        case _ => mim -= v
      }
    }
    (dc * dc, mre * mre + mim * mim, nyq * nyq)
  }

  test("constant / alternating / period-4 signals land in their bins exactly") {
    val n = Multimodal.FrameN
    val const = Seq.fill(n)(7L)
    val alt = Seq.tabulate(n)(j => if (j % 2 == 0) 5L else -5L)
    val p4 = Seq.tabulate(n)(j => Seq(3L, 0L, -3L, 0L)(j % 4)) // cos(2πj/4)·3

    val (cDc, cMid, cNyq) = binPowers(const)
    assert(cDc == (7L * n) * (7L * n) && cMid == 0 && cNyq == 0)

    val (aDc, aMid, aNyq) = binPowers(alt)
    assert(aDc == 0 && aMid == 0 && aNyq == (5L * n) * (5L * n))

    val (pDc, pMid, pNyq) = binPowers(p4)
    assert(pDc == 0 && pNyq == 0 && pMid == (3L * n / 2) * (3L * n / 2))
  }
}

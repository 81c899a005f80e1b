package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Edge-of-domain behavior the docstrings promise, pinned: degenerate token
  * streams through the native dedup kernels, malformed media through the
  * PPM parser, and corrupt sketches through hamming. */
class KernelEdgeSpec extends AnyFunSuite {

  private def toks(ts: String*): ArrayData =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  test("minhash kernel: <3 tokens hash the whole stream as ONE shingle") {
    // 1- and 2-token docs must produce the signature of their joined
    // stream, not crash or emit MaxValue sentinels
    val one = MinhashKernel.sig(toks("alpha")).toLongArray()
    val two = MinhashKernel.sig(toks("alpha", "beta")).toLongArray()
    assert(one.length == 16 && two.length == 16)
    assert(one.forall(v => v >= 0 && v < Long.MaxValue))
    assert(!(one sameElements two))
    // 3 tokens = exactly one 3-gram shingle = the whole stream:
    // must equal the <3-token "whole stream" path on the same stream
    val three = MinhashKernel.sig(toks("a", "b", "c")).toLongArray()
    val whole = MinhashKernel.sig(toks("a b c")).toLongArray()
    assert(three sameElements whole,
      "3-token shingle must hash the space-joined stream bytes")
  }

  test("simhash kernel: empty token stream is signature 0; strict majority") {
    assert(SimhashKernel.sig(toks()) == 0L)
    // one token: every set bit of its hash60 low 32 is a 1-of-1 majority
    val s = SimhashKernel.sig(toks("x"))
    assert(s >= 0 && s < (1L << 32))
    // two tokens with different hashes: a bit set in only one of them is
    // 1 of 2 — NOT a strict majority — so the sig is the AND of the two
    val a = SimhashKernel.sig(toks("x"))
    val b = SimhashKernel.sig(toks("y"))
    assert(SimhashKernel.sig(toks("x", "y")) == (a & b))
  }

  test("PPM parser rejects malformed payloads instead of zero-filling") {
    val good = Multimodal.ppmPayload(7L)
    assert(Multimodal.decodePpm(good)._1 == (8 + 7 % 5))
    // wrong magic
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5 1 1 255 ".getBytes)
    }
    // truncated raster
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(good.dropRight(1))
    }
    // non-255 maxval
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n1 1\n15\n123".getBytes)
    }
    // comment-tolerant header still parses
    val commented = ("P6\n# a comment\n1 1\n255\n".getBytes ++ Array[Byte](1, 2, 3))
    assert(Multimodal.decodePpm(commented) == ((1, 1, 1L, 2L, 3L)))
  }

  test("PV video demuxer: stride sampling, per-frame dims, malformed input") {
    val id = 4L // nf = 2 + 4%3 = 3 frames
    val good = Multimodal.ppvPayload(id)
    // stride 2 samples frames 0 and 2; stride 1 demuxes every frame
    val sampled = Multimodal.decodePpv(id, good, 2)
    assert(sampled.map(_.frame_idx) == Seq(0L, 2L))
    val all = Multimodal.decodePpv(id, good, 1)
    assert(all.map(_.frame_idx) == Seq(0L, 1L, 2L))
    // dims vary per frame: the demuxer must have parsed each header
    assert(all.map(f => (f.width, f.height)) ==
      (0 until 3).map(f => (8 + (id + f) % 5, 6 + (id + f) % 3)))
    // frame-0 sums match the whole-frame pixel formula
    val w0 = (8 + id % 5).toInt; val h0 = (6 + id % 3).toInt
    val px = Array.tabulate(3 * w0 * h0)(i => (id * 7 + i) % 256)
    assert(all.head.sum_r == px.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v }.sum)
    // wrong magic / truncated frame / trailing bytes all throw
    intercept[IllegalArgumentException] {
      Multimodal.decodePpv(id, "PX 1\n".getBytes ++ good.drop(5), 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpv(id, good.dropRight(1), 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpv(id, good ++ Array[Byte](0), 2)
    }
  }

  test("PV frame differencing: exact deltas, identical frames give 0 motion") {
    val id = 4L
    val good = Multimodal.ppvPayload(id)
    val motions = Multimodal.decodePvMotion(id, good)
    // nf = 3 frames -> 2 consecutive pairs, indexed by the later frame
    assert(motions.map(_.frame_idx) == Seq(1L, 2L))
    // pair (0,1): hand-fold the generator formula over the overlap
    val len = (f: Long) => (3 * (8 + (id + f) % 5) * (6 + (id + f) % 3)).toInt
    val n01 = math.min(len(0), len(1))
    val exp01 = (0 until n01).map(i =>
      math.abs((id * 7 + 13 + i) % 256 - (id * 7 + i) % 256)).sum
    assert(motions.head.n_px == n01 && motions.head.motion == exp01)
    // a container of two IDENTICAL frames must measure zero motion
    val w = 2; val h = 2
    val frame = s"P6\n$w $h\n255\n".getBytes ++
      Array.tabulate(3 * w * h)(i => (i % 256).toByte)
    val twin = s"PV 2\n".getBytes ++ frame ++ frame
    val zero = Multimodal.decodePvMotion(0L, twin)
    assert(zero.length == 1 && zero.head.motion == 0L &&
      zero.head.n_px == 3 * w * h)
    // malformed containers still throw
    intercept[IllegalArgumentException] {
      Multimodal.decodePvMotion(id, good.dropRight(1))
    }
  }

  test("WAV parser rejects malformed payloads instead of zero-filling") {
    val good = Multimodal.wavPayload(5L)
    val (sr, n, sumAbs, peak) = Multimodal.decodeWav(good)
    assert(sr == 8000 + (5 % 4) * 4000 && n == 64 + 5 % 33)
    assert(peak <= 2048 && sumAbs >= peak, "amplitude stats inconsistent")
    // wrong magic
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("OGGS".getBytes ++ good.drop(4))
    }
    // truncated data (header dataSize no longer matches)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(good.dropRight(2))
    }
    // stereo/float formats refused, not mis-read as mono PCM
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] { Multimodal.decodeWav(stereo) }
    val floatFmt = good.clone(); floatFmt(20) = 3
    intercept[IllegalArgumentException] { Multimodal.decodeWav(floatFmt) }
  }

  test("hamming: a short/corrupt sketch counts missing words as all-differing") {
    val full = new GenericArrayData(Array[Any](0L, 0L, 0L, 0L))
    val short = new GenericArrayData(Array[Any](0L))
    val d = HammingDist(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1))
    assert(d.nullSafeEval(full, short) == 192L, "3 missing words = 192 bits")
    assert(d.nullSafeEval(full, full) == 0L)
  }
}

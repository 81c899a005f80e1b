package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Codegen'd fused multiply-accumulate over two `array<double>` columns —
  * the GEMM inner loop of every reference operator (reference attention.py:6,
  * mlp.py:7, xentropy.py:10) as a single whole-stage-codegen expression.
  *
  * Replaces the interpreted `aggregate(zip_with(...))` higher-order-function
  * form (CodegenFallback + one intermediate 64-element array per pair) with a
  * tight primitive loop over the two ArrayData buffers — no allocation, no
  * boxing, stays inside the join→aggregate codegen stage.
  *
  * Accumulation order is the sequential left fold, matching DuckDB's
  * `list_dot_product`, so oracle comparison is exact to the last ulp.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JVM-static kernel for the 256-bit sign sketch: the hyperplane matrix is
  * derived once per JVM from the deterministic md5 stream (`plane:<p>:<d>`,
  * same formula as the DuckDB oracle recomputes in SQL) and referenced from
  * generated code by a static call — nothing is serialized into task
  * binaries or expression trees (the composed-`typedLit` version shipped
  * ~1.3 MB of plan per task and minutes of Janino compile). */
object SketchKernel {
  val Bits = 256
  val Words: Int = Bits / 64
  val Dim = 64

  /** First 60 bits of a digest as a long — bit-identical to parsing the
    * first 15 hex digits of the hex string, without building the string
    * (the per-byte `f"$b%02x"` Formatter was ~100× the digest cost,
    * VERDICT r3 "What's wrong" #4): big-endian first 8 bytes >>> 4 drops
    * the 16th nibble, leaving hex digits 1..15. */
  def hex60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** md5 → first 60 bits → (x+0.5)/2^60 − 0.5: identical to the oracle's
    * `u01('plane:p:d') - 0.5` (pure IEEE ops both sides). */
  def planeComponent(p: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val v = hex60(md.digest(s"plane:$p:$d".getBytes(StandardCharsets.UTF_8)))
    (v + 0.5) / 1152921504606846976.0 - 0.5
  }

  /** planes flattened row-major: plane p component d at [p*Dim + d]. */
  lazy val flat: Array[Double] = {
    val a = new Array[Double](Bits * Dim)
    var p = 0
    while (p < Bits) {
      var d = 0
      while (d < Dim) { a(p * Dim + d) = planeComponent(p, d); d += 1 }
      p += 1
    }
    a
  }

  /** packed sign bits: word w bit i = [vec · plane_{64w+i} > 0]. Sequential
    * fold per plane — the same dot order as DuckDB's list_dot_product, so
    * the sign decisions match the oracle exactly. */
  def words(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), Dim)
    val out = new Array[Long](Words)
    var p = 0
    while (p < Bits) {
      val off = p * Dim
      var s = 0.0
      var d = 0
      while (d < n) { s += v.getDouble(d) * flat(off + d); d += 1 }
      if (s > 0) out(p >> 6) |= 1L << (p & 63)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_sketch(vec)`: 256-bit sign sketch of an array<double> as
  * array<long> (4 packed words). One pass over the static plane matrix —
  * see [[SketchKernel]]. */
case class SignSketch(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sketch"

  override def nullSafeEval(v: Any): Any =
    SketchKernel.words(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernel.words($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM-static kernel for the K=16 minhash signature over a token array —
  * the codegen'd replacement for the interpreted `aggregate`/`zip_with`
  * fold (VERDICT r4 next-steps #1: dedup touches every corpus byte, and the
  * HOF lambdas were ~5.6 CPU-µs/char of pure interpreter overhead).
  *
  * Bit-identical to the fold it replaces (and to the DuckDB oracle dual in
  * [[graft.operators.Dedup.minhashSigSql]]):
  *   - shingles: word 3-grams joined by ' ' when ≥3 tokens, else the whole
  *     token stream as one shingle (reference-free; Dedup.shingles);
  *   - ONE md5 per shingle → two 60-bit halves (hex digits 1-15 / 17-31,
  *     computed straight from the digest bytes — big-endian 8 bytes >>> 4,
  *     same trick as [[SketchKernel.hex60]]);
  *   - Kirsch–Mitzenmacher double hashing h_j = (h1 % 2^58) + j·(h2 % 2^54)
  *     for j < 16 (max < 2^59, no overflow), K running minima in one pass.
  *
  * The shingle bytes are streamed into the digest (token bytes + ' '
  * separators) — no intermediate shingle string, no per-shingle allocation
  * beyond the 16-byte digest. Tokens are ASCII `[a-z0-9]+` matches so the
  * byte stream equals the UTF-8 of the joined string trivially.
  */
object MinhashKernel {
  val K = 16
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit value from 8 digest bytes at `off`, big-endian, low nibble
    * dropped — equals parsing hex digits [2*off+1 .. 2*off+15]. */
  private def hex60At(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def sig(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](K)
    java.util.Arrays.fill(out, Long.MaxValue)
    val digest = md.get()
    // fold one shingle (tokens [from, from+len)) into the K minima
    def absorb(from: Int, len: Int): Unit = {
      digest.reset()
      var i = 0
      while (i < len) {
        if (i > 0) digest.update(' '.toByte)
        digest.update(toks.getUTF8String(from + i).getBytes)
        i += 1
      }
      val d = digest.digest()
      val h2 = hex60At(d, 8) % VecOps.DhM2
      var v = hex60At(d, 0) % VecOps.DhM1
      var j = 0
      while (j < K) { if (v < out(j)) out(j) = v; v += h2; j += 1 }
    }
    if (n >= 3) {
      var i = 0
      while (i + 3 <= n) { absorb(i, 3); i += 1 }
    } else absorb(0, n)
    new GenericArrayData(out)
  }
}

/** `graft_minhash(tokens)`: K=16 minhash signature of an array<string>
  * token column as array<long>. One tight-loop pass — see [[MinhashKernel]]. */
case class MinhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(v: Any): Any =
    MinhashKernel.sig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM-static kernel for the 32-bit SimHash signature over a token array —
  * same treatment as [[MinhashKernel]] for the other corpus-linear dedup
  * signature: the column formulation computed hash60 per token once but
  * then ran 32 interpreted `filter` scans over the hash array (one per
  * signature bit) — 32 × n_tokens lambda evaluations per document.
  *
  * Bit-identical to that formulation (and to the DuckDB dual in
  * [[graft.operators.Dedup.simhashSigSql]]): per token, h = first 60 bits
  * of md5 (the [[VecOps.hash60]] stream); counter k += bit k of h for
  * k < 32; signature bit k set iff 2·counter_k > n_tokens (strict
  * majority). One md5 and one 32-step counter update per token. */
object SimhashKernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def sig(toks: ArrayData): Long = {
    val n = toks.numElements()
    val cnt = new Array[Int](32)
    val digest = md.get()
    var i = 0
    while (i < n) {
      digest.reset()
      digest.update(toks.getUTF8String(i).getBytes)
      val d = digest.digest()
      // first 8 bytes big-endian >>> 4 == hex digits 1-15 == hash60
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      var k = 0
      while (k < 32) { cnt(k) += ((h >>> k) & 1L).toInt; k += 1 }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 32) { if (2 * cnt(k) > n) out |= 1L << k; k += 1 }
    out
  }
}

/** `graft_simhash(tokens)`: 32-bit SimHash of an array<string> token column
  * as long. One tight-loop pass — see [[SimhashKernel]]. */
case class SimhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any =
    SimhashKernel.sig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dot_f32(a, b)`: FLOAT32 dot product over two array<float>
  * columns — the reference's float32 smoke-test precision
  * (test_custom_op.py:22-23: kernels run torch.float32; every other repo
  * kernel widens to double). Sequential left fold with single-precision
  * rounding at EVERY step (multiply then accumulate), bit-identical to the
  * DuckDB dual `list_reduce(list_transform(range(len(a)),
  * i -> CAST(a[i+1]*b[i+1] AS FLOAT)), (x,y) -> CAST(x+y AS FLOAT))`:
  * a float×float product and a float+float sum are both exact in double,
  * so an engine that computes in double and rounds to FLOAT per step gets
  * the same bits as JVM float arithmetic. */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = FloatType
  override def prettyName: String = "graft_dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0f
    var i = 0
    while (i < n) { s += x.getFloat(i) * y.getFloat(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $s = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JVM-static kernel for word n-gram 60-bit hashes over a token array —
  * the decontamination shingle step gets the same native treatment as the
  * minhash/simhash kernels (VERDICT r5 #7: `curate` was the one ScaleSmoke
  * stage whose 10× ratio tracked data, because its md5 shingling ran
  * through the interpreted `transform` HOF while every other
  * corpus-linear kernel is codegen'd).
  *
  * Bit-identical to `transform(sequence(1, greatest(n-(N-1), 1)),
  * i -> hash60(concat_ws(' ', slice(toks, i, N))))` (and to the DuckDB
  * dual in [[graft.operators.Decontaminate.flagCtes]]): one md5 per
  * shingle, bytes streamed token-by-token with ' ' separators, first 60
  * bits of the digest ([[SketchKernel.hex60]] trick). Documents shorter
  * than N tokens contribute their single full-stream shingle. */
object NgramHashKernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Long](count)
    val digest = md.get()
    var s = 0
    while (s < count) {
      digest.reset()
      val end = math.min(s + n, len)
      var i = s
      var first = true
      while (i < end) {
        // null elements are skipped WITH their separator, matching the
        // concat_ws semantics of the HOF form this kernel replaced (the
        // tokenizer never yields nulls, but the expression is public and
        // typed array<string> containsNull=true)
        if (!toks.isNullAt(i)) {
          if (!first) digest.update(' '.toByte)
          digest.update(toks.getUTF8String(i).getBytes)
          first = false
        }
        i += 1
      }
      val d = digest.digest()
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(s) = h >>> 4
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** JVM-static kernel for the winnowing fingerprint set — one pass over the
  * normalized text: 60-bit md5 hashes of every char k-gram (the
  * [[VecOps.hash60]] stream, same digest-byte trick as [[NgramHashKernel]]),
  * then the DISTINCT minima over every sliding window of `w` consecutive
  * hashes, ascending. The column formulation (`transform` over window
  * starts of `array_min(slice(h, ...))`) re-evaluated the k-gram md5 map
  * PER WINDOW under CollapseProject — w× the digest cost, the exact trap
  * the minhash kernel escaped (see [[MinhashKernel]]); here the hashes are
  * computed once and the window scan is pure long compares.
  *
  * Matches the SQL dual bit-exactly: `substr(t, i, k)` clamps at the
  * string end, a text shorter than one k-gram hashes as a single
  * (possibly short) gram, and a hash array shorter than `w` winnows as
  * one whole-array window. Gram positions count Unicode CODE POINTS —
  * the unit Spark's `substr` and DuckDB's `substr` both count — not
  * UTF-16 units (a Java-String `substring` walk shifts gram boundaries
  * on any non-BMP character and splits surrogate pairs, whose UTF-8
  * encoding degenerates to replacement bytes); the grams are sliced
  * straight out of the UTF-8 byte array via a precomputed per-code-point
  * offset table, so the scan stays O(bytes) with zero per-gram String
  * allocation. */
object WinnowKernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** UTF-8 sequence length from its lead byte (valid input assumed —
    * Spark strings are well-formed UTF-8). */
  private def seqLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3 else 4
  }

  def fps(t: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = t.getBytes
    // off(c) = byte offset of code point c; off(nc) = bytes.length —
    // gram i covers bytes [off(i), off(min(i+k, nc)))
    var nc = 0
    var p = 0
    while (p < bytes.length) { p += seqLen(bytes(p)); nc += 1 }
    val off = new Array[Int](nc + 1)
    p = 0
    var c = 0
    while (p < bytes.length) { off(c) = p; p += seqLen(bytes(p)); c += 1 }
    off(nc) = bytes.length
    val n = math.max(nc - (k - 1), 1)
    val h = new Array[Long](n)
    val digest = md.get()
    var i = 0
    while (i < n) {
      digest.reset()
      val from = off(i)
      digest.update(bytes, from, off(math.min(i + k, nc)) - from)
      val d = digest.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(i) = v >>> 4 // first 15 hex digits == hash60
      i += 1
    }
    val wl = math.min(w, n)
    val sel = new java.util.TreeSet[java.lang.Long]() // distinct + ascending
    // monotonic-deque sliding minimum: O(n) total instead of O(n·w)
    // (VERDICT r10 #7 note) — each index enters and leaves the deque once;
    // the front always holds an argmin of the current window. Ties keep
    // the later index (>= pop), which cannot change the emitted VALUE set.
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // live indices in dq(head until tail)
    var j = 0
    while (j < n) {
      while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (dq(head) <= j - wl) head += 1
      if (j >= wl - 1) sel.add(h(dq(head)))
      j += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_winnow(text)`: ascending distinct winnowing fingerprints of a
  * string column as array<long>. One tight-loop pass — see [[WinnowKernel]]. */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.fps(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernel.fps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ngram_hashes(tokens)`: 60-bit hashes of the token array's word
  * n-grams as array<long>. One tight-loop pass — see [[NgramHashKernel]]. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(v: Any): Any =
    NgramHashKernel.hashes(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHashKernel.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_hamming(a, b)`: popcount of XOR over two packed-bit array<long>
  * columns. A length mismatch (malformed/empty sketch) counts every missing
  * word as 64 differing bits — a truncating version would score a corrupt
  * sketch as hamming 0, silently ranking it the nearest neighbor of every
  * query (ADVICE r3). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, array<long>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 64L * (math.max(x.numElements(), y.numElements()) - n)
    var i = 0
    while (i < n) { h += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $h = 64L * (java.lang.Math.max($a.numElements(), $b.numElements()) - $n);
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JVM-static kernel for the per-pair deterministic noise stream: one
  * splitmix64 finalizer over a linear combination of (seed, a, b) — the
  * cheap integer replacement for the md5-string path the sampler first
  * shipped with (VERDICT r6 plan audit: `sampler_big` spent ~170 CPU-s,
  * ~10× its sibling `*_big` kernels, almost all of it concatenating and
  * md5-ing one string per (m, k) pair).
  *
  * Pure 64-bit integer arithmetic (wraparound multiply, xor, logical
  * shifts), so the DuckDB oracle reproduces it bit-for-bit in SQL via
  * HUGEINT arithmetic mod 2^64 ([[VecOps.mix60ColsSql]]) — no libm, no
  * digest, no strings. The output is the top 60 bits (a nonnegative
  * BIGINT in both engines), feeding the same (h+0.5)/2^60 u01 conversion
  * as the md5-based [[VecOps.hash60]] stream.
  *
  * Inputs must be nonnegative (ids): Java's two's-complement wraparound
  * and the oracle's nonneg HUGEINT mod-2^64 arithmetic agree on [0, 2^63).
  */
object Mix60Kernel {
  final val C1 = 0x9E3779B97F4A7C15L // golden-ratio increment (splitmix64)
  final val C2 = 0xC2B2AE3D27D4EB4FL // xxhash64 prime_2, decorrelates b from a
  final val M1 = 0xBF58476D1CE4E5B9L // splitmix64 finalizer multipliers
  final val M2 = 0x94D049BB133111EBL

  def mix60(seed: Long, a: Long, b: Long): Long = {
    var z = seed + a * C1 + b * C2
    z = (z ^ (z >>> 30)) * M1
    z = (z ^ (z >>> 27)) * M2
    z = z ^ (z >>> 31)
    z >>> 4
  }
}

/** `graft_mix60(a, b)`: 60-bit splitmix64-mixed hash of two long id
  * columns under a plan-literal seed. See [[Mix60Kernel]]. */
case class PairMix60(seed: Long, left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix60"

  override def nullSafeEval(a: Any, b: Any): Any =
    Mix60Kernel.mix60(seed, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Mix60Kernel.mix60(${seed}L, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-construction helpers for the native expressions/aggregates. */
object NativeExprs {
  def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  def toCol(e: Expression): Column = ColumnBridge.column(e)

  /** `dot(a, b)` over two array<double> columns, codegen'd. */
  def dot(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  /** float32 `dot(a, b)` over two array<float> columns, codegen'd. */
  def dotF32(a: Column, b: Column): Column =
    toCol(DotProductFloat(toExpr(a), toExpr(b)))

  /** 256-bit packed sign sketch of an array<double> column. */
  def signSketch(v: Column): Column = toCol(SignSketch(toExpr(v)))

  /** K=16 minhash signature of an array<string> token column. */
  def minhashSig(toks: Column): Column = toCol(MinhashSig(toExpr(toks)))

  /** 32-bit SimHash of an array<string> token column. */
  def simhashSig(toks: Column): Column = toCol(SimhashSig(toExpr(toks)))

  /** word n-gram 60-bit hashes of an array<string> token column. */
  def ngramHashes(toks: Column, n: Int): Column =
    toCol(NgramHashes(toExpr(toks), n))

  /** ascending distinct winnowing fingerprints of a string column. */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    toCol(WinnowFps(toExpr(text), k, w))

  /** hamming distance between two packed array<long> sketches. */
  def hamming(a: Column, b: Column): Column = toCol(HammingDist(toExpr(a), toExpr(b)))

  /** 60-bit seeded pair mix of two long id columns, codegen'd. */
  def mix60(seed: Long, a: Column, b: Column): Column =
    toCol(PairMix60(seed, toExpr(a), toExpr(b)))
}

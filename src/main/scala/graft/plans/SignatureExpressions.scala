package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshims.GraftSqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernels for the signature expressions — called from both
  * interpreted eval and generated Java (a plain top-level object compiles
  * to static forwarders the codegen can reference). Tight `while` loops
  * over primitive longs: no per-element lambda dispatch, no intermediate
  * array allocation — the reason these beat the equivalent
  * `aggregate`/`zip_with` higher-order-function formulation ~20×.
  */
object SignatureKernels {
  /** SimHash: per bit, majority vote of the shingle-hash bits. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** MinHash signature: k permutations simulated as seeded xxhash64 of each
    * shingle hash; bit-identical to the column formulation
    * `array_min(transform(shingles, h => xxhash64(h, seed)))` for integer
    * seeds 0..k-1 (builtin xxhash64 starts at seed 42, then folds inputs). */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(hashes.getLong(i), 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, base)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** One-Permutation MinHash with rotation densification: each shingle
    * lands in ONE bin (hash mod k) and the bin keeps the minimum rehash;
    * empty bins borrow circularly from the nearest filled bin to the
    * right, offset by the distance so borrowed values stay distinct
    * across bins. O(shingles + k) per row vs classic minhash's
    * O(shingles × k) — the published fix for signature CPU being the
    * dominant corpus-scale cost (Li/Owen/Zhang 2012 one-permutation
    * hashing; Shrivastava/Li 2014 rotation densification). Same output
    * shape as [[minhash]], so banding/verification reuse unchanged;
    * collision statistics are near-identical for docs with ≳k shingles. */
  def minhashOph(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      // bin choice uses the raw shingle hash; the stored value is an
      // independent rehash so bin index and value are decorrelated
      val bin = java.lang.Long.remainderUnsigned(h, k).toInt
      val v = XXH64.hashLong(h, 42L)
      if (v < sig(bin)) sig(bin) = v
      i += 1
    }
    // rotation densification over the ORIGINAL fill state (borrowing from
    // an already-densified bin would correlate empty runs)
    val filled = new Array[Boolean](k)
    var f = 0
    while (f < k) { filled(f) = sig(f) != Long.MaxValue; f += 1 }
    var b = 0
    while (b < k) {
      if (!filled(b)) {
        var d = 1
        while (d < k && !filled((b + d) % k)) d += 1
        // shingles() never yields an empty array, so some bin is filled
        sig(b) = sig((b + d) % k) + d * 0x9E3779B97F4A7C15L
      }
      b += 1
    }
    new GenericArrayData(sig)
  }
}

/** distinct xxhash64 values of all `n`-codepoint character windows of a
  * string — one pass, no per-window Column/lambda machinery. Bit-compatible
  * with `array_distinct(transform(sequence(...), i => xxhash64(substr(text,
  * i, n))))` up to element ORDER (sorted here; all consumers — minhash,
  * simhash votes, jaccard intersections — are order-invariant). */
object ShingleKernel {
  def shingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    // Hash each n-CODEPOINT window as a byte RANGE of the UTF-8 buffer —
    // a substring's UTF-8 bytes are exactly a contiguous slice of the
    // original, so the hashes are bit-identical to hashing the substring
    // while allocating nothing per window (the former String/UTF8String
    // per window dominated the signature pass).
    val bytes = text.getBytes // compact copy
    val blen = bytes.length
    // codepoint start offsets (a UTF-8 lead byte is any non-continuation
    // byte; continuation bytes are 10xxxxxx)
    var nCp = 0
    var i = 0
    while (i < blen) { if ((bytes(i) & 0xC0) != 0x80) nCp += 1; i += 1 }
    val starts = new Array[Int](nCp + 1)
    var cp = 0
    i = 0
    while (i < blen) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(nCp) = blen
    val count = math.max(nCp - n + 1, 1)
    val hashes = new Array[Long](count)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    i = 0
    while (i < count) {
      // SQL substr(i+1, n) semantics: n codepoints starting at codepoint i
      // (clamped at the end; empty input yields ONE hash of "")
      val from = if (i < nCp) starts(i) else blen
      val to = starts(math.min(i + n, nCp))
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, off + from, to - from, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var uniq = if (count > 0) 1 else 0
    var j = 1
    while (j < count) { if (hashes(j) != hashes(j - 1)) uniq += 1; j += 1 }
    if (uniq == count) new GenericArrayData(hashes)
    else {
      val out = new Array[Long](uniq)
      out(0) = hashes(0)
      var k = 1; var o = 1
      while (k < count) {
        if (hashes(k) != hashes(k - 1)) { out(o) = hashes(k); o += 1 }
        k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** distinct xxhash64 values of all `n`-WORD windows of a single-space-
  * separated string (the output of `normalizeText`) — one pass over the
  * UTF-8 bytes. An n-token window joined with " " is exactly a byte range
  * of the input (tokens are single-space separated), so each window hashes
  * in place: no per-window string building, no lambda dispatch — the
  * reason this beats the `transform(sequence(...), i =>
  * xxhash64(concat_ws(" ", slice(toks, i, n))))` HOF formulation.
  * Bit-compatible with that formulation up to element ORDER (sorted
  * here); fewer-than-n-token inputs yield ONE window of all tokens,
  * matching `greatest(size - (n-1), 1)` + slice semantics. */
object WordShingleKernel {
  def shingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes // compact copy; offsets below are 0-based
    val len = bytes.length
    // token start offsets (tokens = runs between single 0x20 separators —
    // multi-byte UTF-8 never contains 0x20 in continuation bytes)
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val count = math.max(nTokens - n + 1, 1)
    val hashes = new Array[Long](count)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    var w = 0
    while (w < count) {
      val from = starts(w)
      val lastTok = math.min(w + n - 1, nTokens - 1)
      val to = if (lastTok == nTokens - 1) len else starts(lastTok + 1) - 1
      hashes(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, off + from, to - from, 42L)
      w += 1
    }
    java.util.Arrays.sort(hashes)
    var uniq = if (count > 0) 1 else 0
    var j = 1
    while (j < count) { if (hashes(j) != hashes(j - 1)) uniq += 1; j += 1 }
    if (uniq == count) new GenericArrayData(hashes)
    else {
      val out = new Array[Long](uniq)
      out(0) = hashes(0)
      var k = 1; var o = 1
      while (k < count) {
        if (hashes(k) != hashes(k - 1)) { out(o) = hashes(k); o += 1 }
        k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** PORTABLE SimHash in one pass: distinct n-codepoint shingle STRINGS of the
  * (already normalized) text → 32-bit hash = first 4 md5 bytes (exactly
  * `conv(substring(md5(s),1,8),16,10)`, which any engine with md5
  * reproduces) → per-bit majority vote over the low `bits` bits. The
  * window/distinct semantics mirror the HOF reference formulation in
  * `Dedup.portableShingleHashes` (distinct by STRING before hashing, so a
  * 32-bit prefix collision between two distinct shingles votes twice —
  * matching an external oracle that dedups strings). */
object PortableSimhashKernel {
  def simhash(text: org.apache.spark.unsafe.types.UTF8String, n: Int, bits: Int): Long = {
    val s = text.toString
    val len = s.codePointCount(0, s.length)
    val count = math.max(len - n + 1, 1)
    // clamp BEFORE doubling: count*2 wraps negative for >= 2^30-codepoint
    // documents, and HashSet(negative) throws
    val seen = new java.util.HashSet[String](math.min(count, 1 << 19) * 2)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    var charIdx = 0
    var i = 0
    while (i < count) {
      // SQL substr(i+1, n) semantics: n codepoints starting at codepoint i
      val end = {
        var e = charIdx; var c = 0
        while (c < n && e < s.length) { e += Character.charCount(s.codePointAt(e)); c += 1 }
        e
      }
      val window = s.substring(charIdx, end)
      if (seen.add(window)) {
        val d = md.digest(window.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      if (charIdx < s.length) charIdx += Character.charCount(s.codePointAt(charIdx))
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** intersection SIZE of two SORTED long arrays — single merge pass, zero
  * allocation. The exact-jaccard verification kernel: on LSH candidate
  * sets this replaces `size(array_intersect(a, b))`, which builds a hash
  * set per invocation. Inputs MUST be sorted (ShingleHashesExpr /
  * WordShingleHashesExpr emit sorted-distinct arrays). */
object SortedIntersectKernel {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** char n-gram shingle hashes (distinct) as a codegen'd expression */
case class ShingleHashesExpr(child: Expression, n: Int)
  extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernel.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** 64-bit SimHash of an array of shingle hashes, as a codegen'd Catalyst
  * expression. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignatureKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** MinHash signature (array of k minima over seeded hashes) as a codegen'd
  * Catalyst expression. */
case class MinHashSigExpr(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0, "minhash k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignatureKernels.minhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** One-Permutation MinHash signature (k bins, rotation-densified) as a
  * codegen'd Catalyst expression. */
case class MinHashOphExpr(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0, "oph bin count must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashOph(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignatureKernels.minhashOph($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashOphExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_oph_signature"
}

/** portable md5-based simhash (normalized text → signature) as a codegen'd
  * expression */
case class PortableSimhashExpr(child: Expression, n: Int, bits: Int)
  extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  require(bits >= 1 && bits <= 63, "bits in [1,63]")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    PortableSimhashKernel.simhash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PortableSimhashKernel.simhash($c, $n, $bits)")
  override protected def withNewChildInternal(newChild: Expression): PortableSimhashExpr =
    copy(child = newChild)
  override def prettyName: String = "portable_simhash"
}

/** word n-gram shingle hashes (sorted-distinct) as a codegen'd expression */
case class WordShingleHashesExpr(child: Expression, n: Int)
  extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    WordShingleKernel.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingleKernel.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

/** sorted-array intersection size as a codegen'd expression */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SortedIntersectKernel.count($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

/** POSITIONAL rolling window fingerprints over a token array — the O(T)
  * production kernel behind `Dedup.removeRepeatedSpans` (the portable md5
  * path materializes every l-token window STRING, an l× write-amplification
  * of the token stream that matters at 100 TB).
  *
  * Element i = 128-bit fingerprint (two independent 64-bit polynomial
  * rolling hashes, struct(h1, h2)) of the window of `l` tokens starting at
  * 0-based token i. Each token is xxhash64'd ONCE per seed over its raw
  * bytes, then the window hash rolls: fp(w+1) = (fp(w) − h(w)·B^{l−1})·B +
  * h(w+l) in wrap-around 2^64 arithmetic — O(tokens) per document total,
  * zero window-string allocation. Two independent (seed, base) pairs make
  * the effective fingerprint 128 bits: at 2^30 corpus windows the expected
  * number of colliding pairs is ~2^59/2^128 ≈ 2e-21, so no legitimate text
  * is ever deleted on a hash accident (the r12 ADVICE precision concern;
  * a single 64-bit hash would already expect ~3% colliding pairs there).
  */
object WindowFingerprintKernel {
  private val B1 = 0x9E3779B97F4A7C15L // golden-ratio odd multiplier
  private val B2 = 0xC2B2AE3D27D4EB4FL // xxhash prime_2, independent base

  def fingerprints(toks: ArrayData, l: Int): ArrayData = {
    val n = toks.numElements()
    val count = n - l + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    // per-token hashes, one pass over the bytes per seed
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      h1(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      h2(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 0x5DEECE66DL)
      i += 1
    }
    // B^(l-1) for the roll-out term
    var p1 = 1L; var p2 = 1L
    i = 1
    while (i < l) { p1 *= B1; p2 *= B2; i += 1 }
    val out = new Array[Any](count)
    var f1 = 0L; var f2 = 0L
    i = 0
    while (i < l) { f1 = f1 * B1 + h1(i); f2 = f2 * B2 + h2(i); i += 1 }
    out(0) = org.apache.spark.sql.catalyst.InternalRow(f1, f2)
    var w = 1
    while (w < count) {
      f1 = (f1 - h1(w - 1) * p1) * B1 + h1(w + l - 1)
      f2 = (f2 - h2(w - 1) * p2) * B2 + h2(w + l - 1)
      out(w) = org.apache.spark.sql.catalyst.InternalRow(f1, f2)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** positional 128-bit window fingerprints of a token array, codegen'd */
case class WindowFingerprintsExpr(child: Expression, l: Int)
  extends UnaryExpression {
  require(l >= 2, "window length l must be >= 2")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    WindowFingerprintKernel.fingerprints(input.asInstanceOf[ArrayData], l)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WindowFingerprintKernel.fingerprints($c, $l)")
  override protected def withNewChildInternal(newChild: Expression): WindowFingerprintsExpr =
    copy(child = newChild)
  override def prettyName: String = "window_fingerprints"
}

object SignatureExpressions {
  def simhash64(hashes: Column): Column =
    GraftSqlShims.column(SimHash64Expr(GraftSqlShims.expression(hashes)))
  def minhashSignature(hashes: Column, k: Int): Column =
    GraftSqlShims.column(MinHashSigExpr(GraftSqlShims.expression(hashes), k))
  def minhashOphSignature(hashes: Column, k: Int): Column =
    GraftSqlShims.column(MinHashOphExpr(GraftSqlShims.expression(hashes), k))
  def shingleHashes(text: Column, n: Int): Column =
    GraftSqlShims.column(ShingleHashesExpr(GraftSqlShims.expression(text), n))
  def wordShingleHashes(normText: Column, n: Int): Column =
    GraftSqlShims.column(WordShingleHashesExpr(GraftSqlShims.expression(normText), n))
  def portableSimhash(normText: Column, n: Int, bits: Int): Column =
    GraftSqlShims.column(PortableSimhashExpr(GraftSqlShims.expression(normText), n, bits))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlShims.column(SortedIntersectCountExpr(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
  def windowFingerprints(toks: Column, l: Int): Column =
    GraftSqlShims.column(WindowFingerprintsExpr(GraftSqlShims.expression(toks), l))
}

package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernels behind the custom hash/sketch expressions.
  *
  * Each kernel is a static method (Scala top-level object ⇒ Java static
  * forwarder), so whole-stage codegen can emit a direct
  * `HashKernels.xxx(arr)` call instead of falling back to the boxed
  * `Expression.eval(InternalRow)` path — the projection stays one fused
  * codegen stage, and interpreted mode calls the very same kernel, so
  * both paths are bit-identical by construction.
  *
  * The MD5 instance is per-thread (kernels are static; Spark evaluates
  * expressions on many task threads concurrently) and reused across rows
  * — digest allocation is the dominant constant factor at one hash per
  * token × 10¹¹ tokens.
  */
object HashKernels {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  @inline private def prefix32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** Per-element md5-prefix hashes of a string array. Null elements hash
    * as the empty string (the house null ≡ empty rule; getUTF8String
    * returns null for a null slot and would otherwise NPE — internal
    * token arrays are containsNull=false, but the SQL registry accepts
    * anything).
    */
  def md5Prefix(xs: ArrayData): ArrayData = {
    val md = digest.get()
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val s = xs.getUTF8String(i)
      out(i) = prefix32(md.digest(
        if (s == null) Array.emptyByteArray else s.getBytes))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Space = Array(' '.toByte)

  /** md5-prefix hash of every `width`-token space-joined shingle. Null
    * tokens join as empty strings (null ≡ empty; see [[md5Prefix]]).
    */
  def wordShingle(xs: ArrayData, width: Int): ArrayData = {
    val md = digest.get()
    val n = xs.numElements()
    val tokenBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = xs.getUTF8String(i)
      tokenBytes(i) = if (s == null) Array.emptyByteArray else s.getBytes
      i += 1
    }
    val nSh = math.max(n - width + 1, 1)
    val out = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      md.reset()
      var j = i
      val end = math.min(i + width, n)
      while (j < end) {
        if (j > i) md.update(Space)
        md.update(tokenBytes(j))
        j += 1
      }
      out(i) = prefix32(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-prefix hash of every `width`-char substring (codepoint-sliced).
    * One forward pass records each codepoint's byte offset, then every
    * gram digests its byte range directly — `substringSQL(i+1, width)`
    * per gram re-scans the string from byte 0 to find codepoint i, which
    * is O(n²) on long documents (the dedup hot loop this kernel exists
    * to accelerate). Byte-identical: same codepoint slicing, same UTF-8
    * bytes into the digest.
    */
  def charGram(s: UTF8String, width: Int): ArrayData = {
    val md = digest.get()
    val bytes = s.getBytes
    val nBytes = bytes.length
    val starts = new Array[Int](s.numChars() + 1)
    var n = 0
    var off = 0
    while (off < nBytes) {
      starts(n) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    starts(n) = nBytes
    val nG = math.max(n - width + 1, 1)
    val out = new Array[Long](nG)
    var i = 0
    while (i < nG) {
      md.reset()
      val s0 = starts(i)
      val e0 = starts(math.min(i + width, n))
      md.update(bytes, s0, e0 - s0)
      out(i) = prefix32(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Min over all `width`-windows of the polynomial fold. Empty input →
    * 0 (one window folding nothing — the `greatest(n-w+1, 1)` twin
    * idiom; see [[rollingWindowHashes]]).
    */
  def rollingFingerprint(xs: ArrayData, width: Int, mult: Long, mod: Long): Long = {
    val n = xs.numElements()
    val nWin = math.max(n - width + 1, 1)
    var min = Long.MaxValue
    var i = 0
    while (i < nWin) {
      var h = 0L
      var j = i
      val end = math.min(i + width, n)
      while (j < end) { h = (h * mult + xs.getLong(j)) % mod; j += 1 }
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Every `width`-window polynomial fold hash. Empty input → [0]: the
    * SQL twins use the `range(1, greatest(n-w+1, 1) + 1)` idiom, whose
    * empty-input case is ONE window folding nothing (fold seed 0) — an
    * empty result here would diverge from every oracle built on that
    * idiom (latent internally: tokens() never yields an empty array).
    */
  def rollingWindowHashes(xs: ArrayData, width: Int, mult: Long, mod: Long): ArrayData = {
    val n = xs.numElements()
    val nWin = math.max(n - width + 1, 1)
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var h = 0L
      var j = i
      val end = math.min(i + width, n)
      while (j < end) { h = (h * mult + xs.getLong(j)) % mod; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** K minima of (a(j)·x + b(j)) mod m over the element hashes (caller
    * handles empty-input → null).
    */
  def minhash(xs: ArrayData, a: Array[Long], b: Array[Long], mod: Long): ArrayData = {
    val n = xs.numElements()
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < k) {
        val h = (a(j) * x + b(j)) % mod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sort-ascending + dedup of a long array in one pass — the kernel
    * behind `sorted_distinct`, which replaces
    * `array_sort(array_distinct(...))`: the built-in pair costs two array
    * passes plus a lambda comparator that is CodegenFallback (ArraySort
    * lowers to a HOF), knocking the whole sketch projection out of
    * whole-stage codegen. Output order differs from array_distinct's
    * first-occurrence order, but every consumer (set sizes, merge
    * intersections, minima) is order-insensitive — and the sorted order
    * is exactly what the merge-scan intersection requires.
    */
  /** Min over each `width`-element window — the winnowing selection
    * step as one allocation-free pass, matching
    * `transform(sequence(1, greatest(n-w+1, 1)), j ->
    * array_min(slice(xs, j, w)))` exactly: inputs shorter than `width`
    * yield ONE window over all elements. (An interpreted slice
    * allocates a fresh w-element array per position — the dominant CPU
    * term of the winnow fingerprint table, round 14.) Empty input would
    * yield [Long.MaxValue] where the HOF form yields [null] — latent
    * internally, tokens() never yields an empty array (the
    * rollingWindowHashes precedent).
    */
  def slidingMin(xs: ArrayData, width: Int): ArrayData = {
    val n = xs.numElements()
    val nWin = math.max(n - width + 1, 1)
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var min = Long.MaxValue
      var j = i
      val end = math.min(i + width, n)
      while (j < end) {
        val v = xs.getLong(j); if (v < min) min = v; j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  def sortedDistinct(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val arr = new Array[Long](n)
    var m = 0
    var hasNull = false
    var i = 0
    // null elements: deduped and sorted LAST, exactly like
    // array_sort(array_distinct(...)) — reading them as getLong would
    // silently invent 0s (the internal hash arrays are containsNull=false
    // and never hit this branch; SQL users can pass anything)
    while (i < n) {
      if (xs.isNullAt(i)) hasNull = true
      else { arr(m) = xs.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, m)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    if (!hasNull)
      new GenericArrayData(if (w == n) arr else java.util.Arrays.copyOf(arr, w))
    else {
      val out = new Array[Any](w + 1)
      i = 0
      while (i < w) { out(i) = arr(i); i += 1 }
      out(w) = null
      new GenericArrayData(out)
    }
  }

  /** Per-bit majority vote signature; empty input → 0. */
  def simhash(xs: ArrayData, nbits: Int): Long = {
    val n = xs.numElements()
    val counts = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var b = 0
      while (b < nbits) {
        counts(b) += (((x >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nbits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Product-quantization distance tables: for an embedding of
    * `subspaces × subDim` doubles and a flattened codebook laid out
    * `cb[(m·codes + j)·subDim + d]`, the M per-subspace arrays of squared
    * L2 distances to each codebook entry. Per-entry sums accumulate in
    * ascending-dim order — left-assoc, bit-identical to the SQL twin's
    * `+` chain — so argmin codes and ADC scores agree with the oracle to
    * the last ulp.
    */
  def pqDistTables(e: ArrayData, cb: Array[Double], subspaces: Int,
      codes: Int, subDim: Int): ArrayData = {
    val out = new Array[AnyRef](subspaces)
    var m = 0
    while (m < subspaces) {
      val t = new Array[Double](codes)
      val ebase = m * subDim
      var j = 0
      while (j < codes) {
        val base = (m * codes + j) * subDim
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val x = e.getDouble(ebase + d) - cb(base + d)
          s += x * x
          d += 1
        }
        t(j) = s
        j += 1
      }
      out(m) = new GenericArrayData(t)
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Total BPE token count of a word array after applying `merges` in
    * training order — the flat-loop kernel behind `bpe_token_count`,
    * replacing a chain of per-merge `aggregate` HOFs that rebuilt the
    * symbol array per character (interpreted lambdas + O(len²)
    * concat/slice churn — the measured 10 s x32 floor under the BPE
    * queries). Semantics are EXACTLY the fold's, per merge m greedy
    * left-to-right over the output of merge m-1: if the last OUTPUT
    * symbol equals a(m) and the next input symbol equals b(m), the last
    * output symbol becomes merged(m); words decompose by CODE POINT
    * (java.util.regex `split("")` semantics, which the HOF path used via
    * Spark's StringSplit; the empty word decomposes to [""] there — the
    * callers filter empties first, and this kernel mirrors the rule).
    */
  def bpeTokenCount(words: ArrayData, a: Array[String], b: Array[String],
      merged: Array[String]): Long = {
    var total = 0L
    val nWords = words.numElements()
    var w = 0
    while (w < nWords) {
      val s0 = words.getUTF8String(w)
      val str = if (s0 == null) "" else s0.toString
      var len = 0
      var syms: Array[String] = null
      if (str.isEmpty) {
        // Pattern.split("", -1) on "" yields one empty element
        syms = Array("")
        len = 1
      } else {
        len = str.codePointCount(0, str.length)
        syms = new Array[String](len)
        var i = 0
        var off = 0
        while (i < len) {
          val cp = str.codePointAt(off)
          val n = Character.charCount(cp)
          syms(i) = str.substring(off, off + n)
          off += n
          i += 1
        }
      }
      var m = 0
      while (m < a.length) {
        val am = a(m); val bm = b(m); val mm = merged(m)
        var out = 0
        var i = 0
        while (i < len) {
          val x = syms(i)
          if (out > 0 && syms(out - 1) == am && x == bm) syms(out - 1) = mm
          else { syms(out) = x; out += 1 }
          i += 1
        }
        len = out
        m += 1
      }
      total += len
      w += 1
    }
    total
  }

  /** All `width`-codepoint windows of a string, one per position (the
    * tail windows shorten to the remaining suffix), in ONE forward pass
    * recording codepoint byte offsets — the per-row `substring(t, pos+1,
    * w)` idiom re-scans from byte 0 to find codepoint `pos`, which is
    * O(n²) bytes per document (the charGram lesson, again). Output
    * windows share the source byte array (fromBytes wraps, no copy).
    */
  def charWindows(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val numChars = s.numChars()
    if (numChars == 0) return new GenericArrayData(new Array[AnyRef](0))
    val offsets = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (i < n) {
      offsets(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offsets(numChars) = n
    val out = new Array[AnyRef](numChars)
    var p = 0
    while (p < numChars) {
      val end = offsets(math.min(p + width, numChars))
      out(p) = UTF8String.fromBytes(bytes, offsets(p), end - offsets(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Common-prefix length in CODEPOINTS (matching SQL `substr`
    * semantics — both engines count characters, not UTF-16 units or
    * bytes): the LCP primitive of the suffix-array consumers. O(prefix)
    * per call; callers cap their inputs (substring windows) so the cost
    * is bounded by the probe width, not the document.
    */
  def commonPrefixLen(a: UTF8String, b: UTF8String): Int = {
    val sa = a.toString
    val sb = b.toString
    var i = 0
    var cnt = 0
    while (i < sa.length && i < sb.length) {
      val ca = sa.codePointAt(i)
      if (ca != sb.codePointAt(i)) return cnt
      cnt += 1
      i += Character.charCount(ca)
    }
    cnt
  }

  /** Unicode NFC normalization (canonical composition, UAX #15) with the
    * already-normalized fast path: `Normalizer.isNormalized` is a scan
    * with no composition work, and real corpus text is overwhelmingly
    * NFC already — so most rows pay one decode + scan and return the
    * input UTF8String unchanged (keeping its zero-copy backing); only
    * denormalized rows pay the actual normalization and re-encode.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Byte offset of each CODEPOINT of `s` (the one-pass index the stub
    * samplers below share): offsets(p) = byte index where character p
    * starts. `ascii(substr(s, p+1, 1))` in Spark returns the CODE POINT
    * of character p (measured: ascii('é') = 233, ascii('日') = 26085) —
    * the samplers reproduce exactly that via [[codePointAt]].
    */
  @inline private def charOffsets(bytes: Array[Byte], numChars: Int): Array[Int] = {
    val offsets = new Array[Int](numChars)
    var i = 0
    var c = 0
    while (c < numChars) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets
  }

  /** The upper-triangle micro-quantized second-moment pairs of an
    * embedding ([[graft.ops.PretrainOps.embedCovariance]]'s in-row
    * D²/2 expansion) in ONE pass: struct rows (di, dj,
    * floor(e(di)·e(dj)·micro + 0.5)) for 0 ≤ di ≤ dj < D. Replaces the
    * nested `transform(…, transform(slice(…)))` HOF pair, which Spark
    * evaluates INTERPRETED (higher-order lambdas are CodegenFallback) at
    * a boxed allocation per element — the dominant CPU term of the
    * covariance family. floor-then-long matches Spark's
    * `floor(x·y·micro + 0.5).cast("long")` exactly.
    */
  def covPairsMicro(e: ArrayData, micro: Double): ArrayData = {
    val d = e.numElements()
    val arr = e.toDoubleArray()
    val out = new Array[AnyRef](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = arr(i)
      var j = i
      while (j < d) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i.toLong, j.toLong,
            math.floor(xi * arr(j) * micro + 0.5).toLong))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All ordered index pairs (xs(i), xs(j)), i < j, of a string array as
    * (s1, s2) structs — the [[graft.ops.PretrainOps.sourceOverlap]] in-row
    * pair expansion. Replaces the nested `transform(ss, (x, i) =>
    * transform(slice(ss, i+2, n), y => struct(x, y)))` + `flatten` HOF
    * tree, which Spark evaluates INTERPRETED (higher-order lambdas are
    * CodegenFallback) with a boxed slice allocation per outer element.
    * Same pair order as the HOF form (outer index asc, inner asc); output
    * size n(n−1)/2 is bounded by the caller's source-set cardinality.
    */
  def stringPairs(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = xs.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, xs.getUTF8String(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** UTF-8 code point starting at byte `off`. */
  @inline private def codePointAt(bytes: Array[Byte], off: Int): Int = {
    val b0 = bytes(off) & 0xFF
    if (b0 < 0x80) b0
    else if ((b0 & 0xE0) == 0xC0)
      ((b0 & 0x1F) << 6) | (bytes(off + 1) & 0x3F)
    else if ((b0 & 0xF0) == 0xE0)
      ((b0 & 0x0F) << 12) | ((bytes(off + 1) & 0x3F) << 6) |
        (bytes(off + 2) & 0x3F)
    else
      ((b0 & 0x07) << 18) | ((bytes(off + 1) & 0x3F) << 12) |
        ((bytes(off + 2) & 0x3F) << 6) | (bytes(off + 3) & 0x3F)
  }

  /** The 64-bit byte-sampling dHash stub ([[graft.ops.BinaryOps]] image
    * stub and [[graft.ops.VideoOps]] per-frame stub) in ONE pass: bit k
    * (row r = k/cols, col c = k%cols) is set when sample(r·(cols+1)+c) >
    * sample(r·(cols+1)+c+1), where sample(j) = code point of
    * character ((j + offset) mod numChars) — exactly
    * `ascii(substr(t, (j + offset) % n + 1, 1))`. Empty string → 0
    * (the expression form's `when(n === 0, 0L)` guard). Replaces a
    * 128-substr codegen tree whose generated method both dwarfed the
    * JIT and paid an O(position) UTF-8 seek per sample.
    */
  def dhashStub(s: UTF8String, offset: Long, rows: Int, cols: Int): Long = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars == 0) return 0L
    val offsets = charOffsets(bytes, numChars)
    @inline def sample(j: Int): Int =
      codePointAt(bytes, offsets(((j + offset) % numChars).toInt))
    var bits = 0L
    var k = 0
    while (k < rows * cols) {
      val r = k / cols
      val c = k % cols
      val j = r * (cols + 1) + c
      if (sample(j) > sample(j + 1)) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** The Philips-style audio fingerprint STUB ([[graft.ops.AudioOps
    * .audioFpStub]]) in one pass: energy e(i) = code point of
    * character ((i·stride) mod numChars) for i < framesE·bandsE —
    * exactly `ascii(substr(t, (i·stride) % greatest(n,1) + 1, 1))` —
    * and bit (fr-1)·bands+m is set when e(fr,m)-e(fr,m+1) >
    * e(fr-1,m)-e(fr-1,m+1) over the frame×band energy grid
    * (e(fr,m) = e(fr·bandsE + m)). Empty string → 0 (the expression
    * form's n = 0 guard).
    */
  def audioFpStub(s: UTF8String, frames: Int, bands: Int,
      stride: Int): Long = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars == 0) return 0L
    val offsets = charOffsets(bytes, numChars)
    val framesE = frames + 1
    val bandsE = bands + 1
    val e = new Array[Long](framesE * bandsE)
    var i = 0
    while (i < framesE * bandsE) {
      e(i) = codePointAt(bytes,
        offsets(((i.toLong * stride) % numChars).toInt)).toLong
      i += 1
    }
    @inline def energy(fr: Int, m: Int): Long = e(fr * bandsE + m)
    var bits = 0L
    var fr = 1
    while (fr <= frames) {
      var m = 0
      while (m < bands) {
        val k = (fr - 1) * bands + m
        if (energy(fr, m) - energy(fr, m + 1) >
            energy(fr - 1, m) - energy(fr - 1, m + 1))
          bits |= (1L << k)
        m += 1
      }
      fr += 1
    }
    bits
  }
}

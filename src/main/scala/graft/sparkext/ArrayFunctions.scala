package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED distinct long arrays
  * via a merge scan — O(|a|+|b|), zero allocation, zero boxing, codegen'd.
  *
  * This is the hot inner loop of the pairwise-similarity operators
  * (n-gram Jaccard, MinHash verification): the built-in `array_intersect`
  * allocates and populates a hash set per evaluation, which at millions of
  * candidate pairs × hundreds of elements dominates the query. A custom
  * `Expression` (preference order (b) from the build brief — after
  * composing built-ins, before custom plans) removes that constant factor
  * while staying inside whole-stage codegen.
  *
  * Callers must pass `array_sort(array_distinct(...))` inputs — enforced
  * upstream where the arrays are built once per document (cost amortized
  * over all pairs the document participates in).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |${ev.value} = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** Column DSL entry for [[SortedIntersectSize]] (Spark 4 Column↔Expression
    * bridge lives in `sql.classic.ExpressionUtils`).
    */
  def sorted_intersect_size(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column DSL entry for [[MinHashSignature]]. */
  def minhash_signature(xs: Column, a: Seq[Long], b: Seq[Long], mod: Long): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(xs), a, b, mod))

  /** Column DSL entry for [[SimHashBits]]. */
  def simhash_bits(xs: Column, nbits: Int): Column =
    ExpressionUtils.column(SimHashBits(ExpressionUtils.expression(xs), nbits))

  /** Column DSL entry for [[Md5PrefixHashes]]. */
  def md5_prefix_hashes(xs: Column): Column =
    ExpressionUtils.column(Md5PrefixHashes(ExpressionUtils.expression(xs)))

  /** Column DSL entry for [[BpeTokenCount]]. */
  def bpe_token_count(toks: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(toks), merges))

  /** Column DSL entry for [[WordShingleHashes]]. */
  def word_shingle_hashes(xs: Column, width: Int): Column =
    ExpressionUtils.column(WordShingleHashes(ExpressionUtils.expression(xs), width))

  /** Column DSL entry for [[CharGramHashes]]. */
  def char_gram_hashes(text: Column, width: Int): Column =
    ExpressionUtils.column(CharGramHashes(ExpressionUtils.expression(text), width))

  /** Column DSL entry for [[NfcNormalize]]. */
  def nfc_normalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

  /** Column DSL entry for [[CommonPrefixLen]]. */
  def common_prefix_len(a: Column, b: Column): Column =
    ExpressionUtils.column(CommonPrefixLen(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column DSL entry for [[CharWindows]]. */
  def char_windows(text: Column, width: Int): Column =
    ExpressionUtils.column(CharWindows(ExpressionUtils.expression(text), width))

  /** Column DSL entry for [[SlidingMin]]. */
  def sliding_min(xs: Column, width: Int): Column =
    ExpressionUtils.column(SlidingMin(ExpressionUtils.expression(xs), width))

  /** Column DSL entry for [[RollingFingerprint]]. */
  def rolling_fingerprint(xs: Column, width: Int, mult: Long, mod: Long): Column =
    ExpressionUtils.column(RollingFingerprint(ExpressionUtils.expression(xs), width, mult, mod))

  /** Column DSL entry for [[RollingWindowHashes]]. */
  def rolling_window_hashes(xs: Column, width: Int, mult: Long, mod: Long): Column =
    ExpressionUtils.column(RollingWindowHashes(ExpressionUtils.expression(xs), width, mult, mod))

  /** Column DSL entry for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column DSL entry for [[SortedDistinct]]. */
  def sorted_distinct(xs: Column): Column =
    ExpressionUtils.column(SortedDistinct(ExpressionUtils.expression(xs)))

  /** Column DSL entry for [[PqDistTables]]. */
  def pq_dist_tables(emb: Column, subspaces: Int, codes: Int, subDim: Int,
      codebook: Array[Double]): Column =
    ExpressionUtils.column(PqDistTables(ExpressionUtils.expression(emb),
      subspaces, codes, subDim, codebook.toIndexedSeq))

  /** Column DSL entry for [[CovPairsMicro]]. */
  def cov_pairs_micro(emb: Column, micro: Double): Column =
    ExpressionUtils.column(CovPairsMicro(ExpressionUtils.expression(emb), micro))

  /** Column DSL entry for [[StringPairs]]. */
  def string_pairs(xs: Column): Column =
    ExpressionUtils.column(StringPairs(ExpressionUtils.expression(xs)))

  /** Column DSL entry for [[DhashStub]]. */
  def dhash_stub(text: Column, offset: Column, rows: Int, cols: Int): Column =
    ExpressionUtils.column(DhashStub(ExpressionUtils.expression(text),
      ExpressionUtils.expression(offset), rows, cols))

  /** Column DSL entry for [[AudioFpStubExpr]]. */
  def audio_fp_stub(text: Column, frames: Int, bands: Int, stride: Int): Column =
    ExpressionUtils.column(AudioFpStubExpr(ExpressionUtils.expression(text),
      frames, bands, stride))

  /** Fully-qualified static-call prefix emitted into generated code: the
    * sketch expressions' `doGenCode` all compile to one
    * `HashKernels.<kernel>(...)` call, so the projection stays one fused
    * whole-stage-codegen span and the interpreted path (same kernel) is
    * bit-identical by construction.
    */
  private[graftext] val Kernels = "org.apache.spark.sql.graftext.HashKernels"
}

/** One-pass MinHash signature: for a long-array of element hashes, returns
  * the K minima of (a(j)·x + b(j)) mod m — replacing K separate
  * `array_min(transform(...))` higher-order calls, which Spark evaluates
  * interpreted (HOF lambdas are CodegenFallback) at O(K·n) boxed steps per
  * row. Both evaluation paths call [[HashKernels.minhash]]: interpreted
  * eval directly, codegen via a static call emitted into the fused stage —
  * so the stage keeps whole-stage codegen AND the two paths cannot diverge.
  */
case class MinHashSignature(
    child: Expression, a: Seq[Long], b: Seq[Long], mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty input → null even when the child is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val aArr = a.toArray
  private val bArr = b.toArray

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    if (xs.numElements() == 0) null
    else HashKernels.minhash(xs, aArr, bArr, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, xs =>
      s"""
         |if ($xs.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ArrayFunctions.Kernels}.minhash($xs, $aRef, $bRef, ${mod}L);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** One-pass SimHash: majority vote per bit over the element hashes —
  * replacing `nbits` interpreted aggregate() folds with a single loop.
  * Empty input → 0 (every bit-sum is 0, not > 0), matching the SQL twin.
  * Codegen'd via [[HashKernels.simhash]] (shared with interpreted eval).
  */
case class SimHashBits(child: Expression, nbits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  // > 64 silently corrupts the signature via Java shift-count wraparound
  // (x >> 64 == x >> 0); <= 0 crashes per row — catch at plan time
  require(nbits > 0 && nbits <= 64,
    s"simhash_bits: nbits must be in [1, 64], got $nbits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(HashKernels.simhash(v.asInstanceOf[ArrayData], nbits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.simhash($xs, $nbits)")

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

/** Codegen'd dot product of two DOUBLE arrays — the per-pair inner loop of
  * every cosine-similarity operator. Replaces
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, which Spark evaluates as
  * interpreted HOF lambdas with per-element boxing. Summation is in index
  * order (a left fold starting at 0.0), so results are bit-identical to
  * both the HOF form and the DuckDB oracle's list_reduce.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  // a length mismatch is a corrupted embedding, not data: fail LOUD
  // (silently truncating to min(len) would emit plausible-looking cosine
  // scores; the HOF twin's NULL would at least poison them — a clear
  // error beats both at 100 TB)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_product: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Element-wise token hashing: for each UTF-8 string in the array, the
  * first 32 bits of its md5 as a long — semantically identical to
  * `transform(arr, x -> conv(substring(md5(x),1,8),16,10))` but in one
  * tight loop with a reused MessageDigest instead of an interpreted HOF
  * lambda allocating the digest + hex string + conv parse per element.
  * This is the signature-build hot loop of the MinHash/ngram dedup ops;
  * both paths run [[HashKernels.md5Prefix]].
  */
case class Md5PrefixHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_prefix_hashes"

  override def nullSafeEval(v: Any): Any =
    HashKernels.md5Prefix(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.md5Prefix($xs)")

  override protected def withNewChildInternal(c: Expression): Md5PrefixHashes =
    copy(child = c)
}

/** Total BPE token count of a word array after applying a learned merge
  * table in training order — semantically identical to the per-word
  * `aggregate(toks, 0L, (acc, w) -> acc + size(applyMerges(w)))` fold
  * chain (8 nested `aggregate` HOFs, one per merge, each rebuilding the
  * symbol array per character through interpreted lambdas), but as ONE
  * flat kernel loop: decompose by code point, compact in place per
  * merge, count. The merge table rides the expression as a reference
  * object (tokenizer-vocab-sized, broadcast-scale — never a corpus
  * join); both evaluation paths run [[HashKernels.bpeTokenCount]].
  * This was the measured 10 s x32 floor under tokenize_bpe /
  * pack_sequences_bpe / bpe_fertility / corpus_to_sequences_bpe.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val ma: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mb: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mm: Array[String] =
    merges.map(p => p._1 + p._2).toArray

  override def nullSafeEval(v: Any): Any =
    HashKernels.bpeTokenCount(v.asInstanceOf[ArrayData], ma, mb, mm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergeA", ma, "java.lang.String[]")
    val bRef = ctx.addReferenceObj("bpeMergeB", mb, "java.lang.String[]")
    val mRef = ctx.addReferenceObj("bpeMergeM", mm, "java.lang.String[]")
    defineCodeGen(ctx, ev, xs =>
      s"${ArrayFunctions.Kernels}.bpeTokenCount($xs, $aRef, $bRef, $mRef)")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

/** Word-shingle hashing in one pass: for token array t and width w, the
  * md5-prefix hash of each w-token shingle "t(i) t(i+1) … t(i+w-1)"
  * (space-joined), i = 0 … max(n-w, 0). Short inputs (< w tokens) yield
  * one shingle of all tokens — matching
  * `transform(sequence(1, greatest(n-w+1, 1)), i -> concat_ws(' ',
  * slice(t, i, w)))` exactly, but without materializing 1.5M interpreted
  * shingle strings per partition: [[HashKernels.wordShingle]] feeds the
  * digest token bytes + a space directly, on both evaluation paths.
  */
case class WordShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"word_shingle_hashes: width must be positive, got $width")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    HashKernels.wordShingle(v.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.wordShingle($xs, $width)")

  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

/** Character-gram hashing in one pass: md5-prefix hash of every w-char
  * substring of the input (1 gram for inputs shorter than w) — matching
  * `transform(sequence(1, greatest(len-w+1, 1)), i -> substr(text, i, w))`
  * + element hashing, with codepoint-correct slicing via UTF8String
  * ([[HashKernels.charGram]] on both paths).
  */
case class CharGramHashes(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"char_gram_hashes: width must be positive, got $width")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(v: Any): Any =
    HashKernels.charGram(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"${ArrayFunctions.Kernels}.charGram($s, $width)")

  override protected def withNewChildInternal(c: Expression): CharGramHashes =
    copy(child = c)
}

/** Unicode NFC normalization (UAX #15 canonical composition) — the text
  * hygiene preamble every multilingual curation pipeline runs before
  * tokenizing/hashing: "é" as U+00E9 and as e+U+0301 must fingerprint,
  * dedup, and tokenize identically. [[HashKernels.nfcNormalize]] on both
  * evaluation paths (already-NFC rows return the input UTF8String
  * untouched); DuckDB's `nfc_normalize` is the oracle twin — both
  * implement the same Unicode algorithm.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    HashKernels.nfcNormalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"${ArrayFunctions.Kernels}.nfcNormalize($s)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** All width-codepoint windows of a string, one per position, in one
  * pass ([[HashKernels.charWindows]] on both evaluation paths) — the
  * suffix-array seed/LCP window builder; tail windows shorten to the
  * remaining suffix, matching `substring(t, pos+1, w)` at doc ends.
  */
case class CharWindows(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"char_windows: width must be positive, got $width")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "char_windows"

  override def nullSafeEval(v: Any): Any =
    HashKernels.charWindows(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"${ArrayFunctions.Kernels}.charWindows($s, $width)")

  override protected def withNewChildInternal(c: Expression): CharWindows =
    copy(child = c)
}

/** Common-prefix length in codepoints ([[HashKernels.commonPrefixLen]]
  * on both evaluation paths) — the LCP primitive of the suffix-array
  * consumers; callers bound the cost by passing capped substring
  * windows.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.commonPrefixLen(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"${ArrayFunctions.Kernels}.commonPrefixLen($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct long array in one pass ([[HashKernels.sortedDistinct]]
  * on both paths) — replaces `array_sort(array_distinct(xs))`, whose
  * ArraySort comparator lambda is CodegenFallback and breaks the fused
  * sketch projection's whole-stage codegen (besides costing an extra
  * array pass). Order-insensitive consumers only: the output is the same
  * SET, ascending instead of first-occurrence order.
  */
case class SortedDistinct(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  // null elements are kept (deduped, sorted last) like
  // array_sort(array_distinct(...)), so containsNull mirrors the child
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(LongType, containsNull = cn)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "sorted_distinct"

  override def nullSafeEval(v: Any): Any =
    HashKernels.sortedDistinct(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.sortedDistinct($xs)")

  override protected def withNewChildInternal(c: Expression): SortedDistinct =
    copy(child = c)
}

/** Min over each `width`-element window of a long array — the winnowing
  * SELECTION step ([[graft.ops.DedupOps.winnowFingerprints]]) as one
  * codegen'd pass: replaces `transform(sequence(1, greatest(n-w+1, 1)),
  * j -> array_min(slice(xs, j, w)))`, whose per-position slice allocates
  * a fresh window array (the winnow table's dominant CPU term). Short
  * inputs (< width) yield one window over all elements, matching the
  * HOF form; kernel [[HashKernels.slidingMin]] on both paths.
  */
case class SlidingMin(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"sliding_min: width must be positive, got $width")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(v: Any): Any =
    HashKernels.slidingMin(v.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.slidingMin($xs, $width)")

  override protected def withNewChildInternal(c: Expression): SlidingMin =
    copy(child = c)
}

/** Winnowing fingerprint: min over all `width`-element windows of the
  * window's polynomial hash fold h = (h·mult + x) mod m — one pass instead
  * of n_windows interpreted aggregate(slice(...)) HOF folds. Inputs
  * shorter than `width` get a single window over all elements; empty
  * input → 0, matching the SQL twins' `greatest(n-w+1, 1)` idiom (one
  * window folding nothing from seed 0 — latent internally, tokens()
  * never yields an empty array). Kernel:
  * [[HashKernels.rollingFingerprint]] on both paths.
  */
case class RollingFingerprint(child: Expression, width: Int, mult: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"rolling_fingerprint: width must be positive, got $width")
  require(mod > 0, s"rolling_fingerprint: mod must be positive, got $mod")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(HashKernels.rollingFingerprint(
      v.asInstanceOf[ArrayData], width, mult, mod))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      xs => s"${ArrayFunctions.Kernels}.rollingFingerprint($xs, $width, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

/** All `width`-element rolling window hashes of a long-array (the array
  * form of [[RollingFingerprint]]: same window/fold definition, every
  * window's hash instead of the min). Lets n-gram-level sketches reuse
  * the per-token md5 hashes — one md5 per TOKEN total, window hashes are
  * integer arithmetic — instead of an md5 per (token × gram-width).
  * Inputs shorter than `width` get a single window over all elements;
  * empty input → empty array. Kernel: [[HashKernels.rollingWindowHashes]].
  */
case class RollingWindowHashes(child: Expression, width: Int, mult: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0, s"rolling_window_hashes: width must be positive, got $width")
  require(mod > 0, s"rolling_window_hashes: mod must be positive, got $mod")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"

  override def nullSafeEval(v: Any): Any =
    HashKernels.rollingWindowHashes(v.asInstanceOf[ArrayData], width, mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      xs => s"${ArrayFunctions.Kernels}.rollingWindowHashes($xs, $width, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): RollingWindowHashes =
    copy(child = c)
}

/** Native Catalyst expression: the PQ per-subspace distance tables of an
  * embedding against a fixed codebook — the per-row kernel of the
  * product-quantization family (encode argmin, query ADC tables). The
  * declarative form expands to subspaces×codes×subDim literal
  * subtract-square terms, a projection large enough to fall out of
  * whole-stage codegen into per-node interpreted eval (measured ~2-6× on
  * the PQ queries); here the codebook rides as ONE reference object and
  * the whole table is one fused loop in both codegen and interpreted
  * modes ([[HashKernels.pqDistTables]] serves both, so they are
  * bit-identical by construction).
  */
case class PqDistTables(child: Expression, subspaces: Int, codes: Int,
    subDim: Int, codebook: IndexedSeq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_tables"

  // IndexedSeq (not Array) as the case-class param: Array equals/hashCode
  // are reference-based, which would break semanticEquals/CSE between
  // content-equal codebooks from different instances. The kernel wants a
  // primitive array — materialized once here.
  private val cbArr = codebook.toArray

  override def nullSafeEval(v: Any): Any =
    HashKernels.pqDistTables(v.asInstanceOf[ArrayData], cbArr,
      subspaces, codes, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"${ArrayFunctions.Kernels}.pqDistTables($x, $cb, $subspaces, $codes, $subDim)")
  }

  override protected def withNewChildInternal(c: Expression): PqDistTables =
    copy(child = c)
}

/** The 64-bit byte-sampling dHash STUB of the multimodal family
  * ([[graft.ops.BinaryOps]] image stub, [[graft.ops.VideoOps]] per-frame
  * stub with `offset = frame_idx · step`) as ONE codegen'd kernel call
  * ([[HashKernels.dhashStub]] on both paths). Replaces the 128-substr
  * `when`-chain, whose generated method dominated the stage's JIT cost
  * and paid an O(position) UTF-8 seek per sample; the kernel indexes
  * every character's byte offset in one pass. Bit-identical to the
  * expression form (spec-pinned), including the empty-string → 0 guard
  * and Spark `ascii`'s code-point semantics (the kernel decodes the full
  * UTF-8 code point at each sampled character offset — the measured
  * Spark 4.1 `ascii(substr(s, p, 1))` behavior and the DuckDB
  * `unicode()` oracle).
  */
case class DhashStub(left: Expression, right: Expression, rows: Int, cols: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash_stub"

  override def nullSafeEval(t: Any, off: Any): Any =
    HashKernels.dhashStub(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      off.asInstanceOf[Long], rows, cols)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, off) => s"${ArrayFunctions.Kernels}.dhashStub($t, $off, $rows, $cols)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DhashStub =
    copy(left = newLeft, right = newRight)
}

/** The audio fingerprint STUB ([[graft.ops.AudioOps.audioFpStub]]) as one
  * codegen'd kernel call ([[HashKernels.audioFpStub]] on both paths):
  * energy sampling + the frame×band temporal-diff bit structure in one
  * pass, replacing the 85-substr energies array + the 64-comparison
  * element_at tree. Bit-identical to the expression form (spec-pinned).
  */
case class AudioFpStubExpr(child: Expression, frames: Int, bands: Int,
    stride: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "audio_fp_stub"

  override def nullSafeEval(t: Any): Any =
    HashKernels.audioFpStub(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      frames, bands, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"${ArrayFunctions.Kernels}.audioFpStub($t, $frames, $bands, $stride)")

  override protected def withNewChildInternal(c: Expression): AudioFpStubExpr =
    copy(child = c)
}

/** The covariance family's in-row upper-triangle pair expansion
  * ([[HashKernels.covPairsMicro]] on both paths): array of (di, dj,
  * xy_micro) structs for 0 ≤ di ≤ dj < D over a double-array embedding.
  * Replaces the nested transform/slice HOF pair (CodegenFallback,
  * interpreted per element — the measured CPU term of
  * `embed_covariance` / `embed_pca_power_iter`). Bit-identical to the
  * HOF form (spec-pinned).
  */
case class CovPairsMicro(child: Expression, micro: Double)
    extends UnaryExpression with ExpectsInputTypes {

  // accepts nullable elements type-wise; callers filter null elements
  // upstream (the kernel reads a primitive double array)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("di", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dj", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("xy_micro", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cov_pairs_micro"

  override def nullSafeEval(v: Any): Any =
    HashKernels.covPairsMicro(v.asInstanceOf[ArrayData], micro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"${ArrayFunctions.Kernels}.covPairsMicro($x, ${micro}D)")

  override protected def withNewChildInternal(c: Expression): CovPairsMicro =
    copy(child = c)
}

/** In-row upper-triangle pair expansion of a string array
  * ([[HashKernels.stringPairs]] on both paths): array of (s1, s2) structs
  * for all index pairs i < j. Replaces [[graft.ops.PretrainOps
  * .sourceOverlap]]'s nested transform/slice HOF tree (CodegenFallback,
  * interpreted per element, a fresh slice array per outer element). Pair
  * order matches the HOF form; bit-identical output (spec-pinned).
  */
case class StringPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s1",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("s2",
        org.apache.spark.sql.types.StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "string_pairs"

  override def nullSafeEval(v: Any): Any =
    HashKernels.stringPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, xs => s"${ArrayFunctions.Kernels}.stringPairs($xs)")

  override protected def withNewChildInternal(c: Expression): StringPairs =
    copy(child = c)
}

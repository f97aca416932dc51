package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{GraftColumnShim => ExpressionUtils}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the scale operators (SURVEY.md §7.2
  * phase 4). Native expressions, not UDFs: they participate in
  * whole-stage codegen via `defineCodeGen` (the generated code calls a
  * static [[Kernels]] method — no boxing, no Scala closure dispatch),
  * and null handling is inherited from Unary/BinaryExpression.
  */

/** MinHash signature of an array<long> of token/shingle hashes. */
case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhash(input.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhash($c, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash of an array<long> of token hashes. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Cosine similarity of two array<float> vectors (double result). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Dot product of two array<float> vectors (double result). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Sorted distinct word-n-gram shingle hashes of a string — the
  * tokenize→shingle→hash→distinct→sort pipeline as one native kernel
  * call (see [[Kernels.shingleSet]]).
  */
case class ShingleSetExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingleSet(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleSetExpr =
    copy(child = c)
  override def prettyName: String = "shingle_set"
}

/** Sorted distinct char-n-gram hashes of a string (byte-windowed). */
case class CharNgramSetExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.charNgramSet(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charNgramSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgramSetExpr =
    copy(child = c)
  override def prettyName: String = "char_ngram_set"
}

/** Winnowing fingerprint set (sorted distinct window-min hashes). */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
  override def prettyName: String = "winnow_fps"
}

/** Max positional gap between winnowing selections — ≤ w by the
  * Schleimer guarantee ([[Kernels.winnowMaxGap]]); gate probe.
  */
case class WinnowGapExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnowMaxGap(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnowMaxGap($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowGapExpr =
    copy(child = c)
  override def prettyName: String = "winnow_max_gap"
}

/** Per-token hashes (document order) of a string — feeds SimHash. */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.tokenHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokenHashes($c)")
  override protected def withNewChildInternal(c: Expression): TokenHashesExpr =
    copy(child = c)
  override def prettyName: String = "token_hashes"
}

/** Intersection size of two sorted distinct arrays (long or string
  * elements) by linear merge — the pairwise-similarity hot kernel.
  * Feed it `array_sort(array_distinct(...))` columns; unsorted input
  * silently undercounts.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      Kernels.sortedIntersectCountString(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      Kernels.sortedIntersectCountLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isString) "sortedIntersectCountString" else "sortedIntersectCountLong"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** [n_lines, n_distinct_lines, dup_line_chars, total_line_chars] —
  * within-document repetition signal ([[Kernels.lineStats]]).
  */
case class LineStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.lineStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.lineStats($c)")
  override protected def withNewChildInternal(c: Expression): LineStatsExpr =
    copy(child = c)
  override def prettyName: String = "line_stats"
}

/** [n_grams, n_distinct_grams, top_gram_count] — word n-gram
  * repetition signal ([[Kernels.ngramRepStats]]).
  */
case class NgramRepStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngramRepStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.ngramRepStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramRepStatsExpr =
    copy(child = c)
  override def prettyName: String = "ngram_rep_stats"
}

/** Lowercased word tokens as array<string> ([[Kernels.tokensLower]]). */
case class TokensLowerExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.tokensLower(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokensLower($c)")
  override protected def withNewChildInternal(c: Expression): TokensLowerExpr =
    copy(child = c)
  override def prettyName: String = "tokens_lower"
}

/** Unicode NFC canonical composition ([[Kernels.nfcNormalize]]) —
  * codegen'd; no-op (no allocation) on already-normalized text.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.nfcNormalize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** Exact-integer quality score ×10⁴ ([[Kernels.qualityE4]]) — one
  * codegen'd byte pass per document.
  */
case class QualityE4Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.qualityE4(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.qualityE4($c)")
  override protected def withNewChildInternal(c: Expression): QualityE4Expr =
    copy(child = c)
  override def prettyName: String = "quality_e4"
}

/** Token-window chunks of a string ([[Kernels.chunkTokens]]) —
  * array<string>, one element per training-sequence window.
  */
case class ChunkTokensExpr(child: Expression, chunk: Int, step: Int)
    extends UnaryExpression {
  require(chunk > 0 && step > 0,
    s"chunk_tokens needs chunk > 0 and step > 0 (got $chunk, $step) — " +
      "a non-positive step would never advance the window")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.chunkTokens(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], chunk, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.chunkTokens($c, $chunk, $step)")
  override protected def withNewChildInternal(c: Expression): ChunkTokensExpr =
    copy(child = c)
  override def prettyName: String = "chunk_tokens"
}

/** [format, width, height, bitDepth] parsed from real media container
  * header bytes (PNG/JPEG/BMP/GIF) — [[Kernels.parseMediaHeader]];
  * scan-stage, no codec. Unrecognized/corrupt → [0,0,0,0].
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.parseMediaHeader(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.parseMediaHeader($c)")
  override protected def withNewChildInternal(c: Expression): MediaHeaderExpr =
    copy(child = c)
  override def prettyName: String = "media_header"
}

/** Synthesize minimal valid container header bytes for (format, w, h)
  * — [[Kernels.makeMediaHeader]]; the generator half of the
  * parse round-trip.
  */
case class MakeMediaHeaderExpr(format: Expression, w: Expression, h: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = format
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(f: Any, a: Any, b: Any): Any =
    Kernels.makeMediaHeader(f.asInstanceOf[Int], a.asInstanceOf[Int],
      b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, a, b) => s"graft.functions.Kernels.makeMediaHeader($f, $a, $b)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MakeMediaHeaderExpr = copy(format = f, w = s, h = t)
  override def prettyName: String = "make_media_header"
}

/** `nBands`-band histogram (long counts) of the payload body bytes
  * after the container header — [[Kernels.byteHistogram]]; scan-stage
  * codegen, the content-sniffer feature family. Null payload → null
  * (callers coalesce to zero counts for the batched-path parity).
  */
case class ByteHistogramExpr(child: Expression, nBands: Int)
    extends UnaryExpression {
  require(nBands > 0 && nBands <= 256,
    s"byte_histogram needs 1..256 bands, got $nBands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.byteHistogram(input.asInstanceOf[Array[Byte]], nBands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.byteHistogram($c, $nBands)")
  override protected def withNewChildInternal(c: Expression): ByteHistogramExpr =
    copy(child = c)
  override def prettyName: String = "byte_histogram"
}

/** Perceptual dHash [hi, lo] of payload body bytes
  * ([[Kernels.bodyDhash]]) — scan-stage codegen image near-dup
  * signature; two non-negative 32-bit halves. Null payload → null.
  */
case class BodyDhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.bodyDhash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.bodyDhash($c)")
  override protected def withNewChildInternal(c: Expression): BodyDhashExpr =
    copy(child = c)
  override def prettyName: String = "body_dhash"
}

/** Mean body-byte intensity in [0,1] ([[Kernels.bodyByteMean]]) —
  * scan-stage codegen grayscale-mean proxy. Null payload → null.
  */
case class BodyMeanExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.bodyByteMean(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.bodyByteMean($c)")
  override protected def withNewChildInternal(c: Expression): BodyMeanExpr =
    copy(child = c)
  override def prettyName: String = "body_mean"
}

/** [format, sample_rate, channels, bits_per_sample, n_frames] parsed
  * from real audio container header bytes (WAV RIFF chunk walk / FLAC
  * STREAMINFO) — [[Kernels.parseAudioHeader]]; scan-stage, no codec.
  * Unrecognized/corrupt → [0,0,0,0,0].
  */
case class AudioHeaderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.parseAudioHeader(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.parseAudioHeader($c)")
  override protected def withNewChildInternal(c: Expression): AudioHeaderExpr =
    copy(child = c)
  override def prettyName: String = "audio_header"
}

/** Synthesize minimal valid audio container header bytes for
  * (format, rate, channels, bits, nFrames) —
  * [[Kernels.makeAudioHeader]]; the generator half of the parse
  * round-trip.
  */
case class MakeAudioHeaderExpr(format: Expression, rate: Expression,
                               channels: Expression, bits: Expression,
                               nFrames: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
  override def children: Seq[Expression] =
    Seq(format, rate, channels, bits, nFrames)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override protected def nullSafeEval(f: Any, r: Any, c: Any, d: Any,
                                      n: Any): Any =
    Kernels.makeAudioHeader(f.asInstanceOf[Int], r.asInstanceOf[Int],
      c.asInstanceOf[Int], d.asInstanceOf[Int], n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, r, c, d, n) =>
      s"graft.functions.Kernels.makeAudioHeader($f, $r, $c, $d, $n)")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MakeAudioHeaderExpr =
    copy(format = newChildren(0), rate = newChildren(1),
      channels = newChildren(2), bits = newChildren(3),
      nFrames = newChildren(4))
  override def prettyName: String = "make_audio_header"
}

/** [format, mvhd_version, timescale, duration, n_tracks] from ISO-BMFF
  * (MP4/MOV) container bytes — [[Kernels.parseVideoHeader]]'s box walk
  * in the scan stage. Unrecognized/corrupt → [0,0,0,0,0].
  */
case class VideoHeaderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.parseVideoHeader(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.parseVideoHeader($c)")
  override protected def withNewChildInternal(c: Expression): VideoHeaderExpr =
    copy(child = c)
  override def prettyName: String = "video_header"
}

/** Synthesize minimal valid ISO-BMFF bytes for (format, mvhdVersion,
  * timescale, duration, nTracks) — [[Kernels.makeVideoHeader]]; the
  * generator half of the parse round-trip.
  */
case class MakeVideoHeaderExpr(format: Expression, version: Expression,
                               timescale: Expression, duration: Expression,
                               nTracks: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
  override def children: Seq[Expression] =
    Seq(format, version, timescale, duration, nTracks)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override protected def nullSafeEval(f: Any, v: Any, t: Any, d: Any,
                                      n: Any): Any =
    Kernels.makeVideoHeader(f.asInstanceOf[Int], v.asInstanceOf[Int],
      t.asInstanceOf[Int], d.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v, t, d, n) =>
      s"graft.functions.Kernels.makeVideoHeader($f, $v, $t, $d, $n)")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MakeVideoHeaderExpr =
    copy(format = newChildren(0), version = newChildren(1),
      timescale = newChildren(2), duration = newChildren(3),
      nTracks = newChildren(4))
  override def prettyName: String = "make_video_header"
}

/** Ids of the `n` nearest codebook centroids by cosine (scan-stage IVF
  * list assignment — see [[Kernels.nearestCentroids]]). `cents`/`ids`
  * are foldable codebook literals, so codegen references them as
  * constants; only `vec` varies per row.
  */
case class NearestCentroidsExpr(vec: Expression, cents: Expression,
                                ids: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = ids
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, c: Any, i: Any): Any =
    Kernels.nearestCentroids(v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], i.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c, i) => s"graft.functions.Kernels.nearestCentroids($v, $c, $i, $n)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): NearestCentroidsExpr = copy(vec = f, cents = s, ids = t)
  override def prettyName: String = "nearest_centroids"
}

/** Signed-random-projection LSH bucket id for an array<float>. */
case class SrpBucketExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.srpBucket(input.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.srpBucket($c, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SrpBucketExpr =
    copy(child = c)
  override def prettyName: String = "srp_bucket"
}

/** Query-directed multi-probe bucket sequence for SRP-LSH — the
  * `nProbes` likeliest buckets ordered by flip cost
  * ([[Kernels.srpProbes]]; probes[0] is the row's own bucket).
  */
case class SrpProbesExpr(child: Expression, bits: Int, seed: Long,
                         nProbes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.srpProbes(input.asInstanceOf[ArrayData], bits, seed, nProbes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.srpProbes($c, $bits, ${seed}L, $nProbes)")
  override protected def withNewChildInternal(c: Expression): SrpProbesExpr =
    copy(child = c)
  override def prettyName: String = "srp_probes"
}

/** Sorted distinct ids of blocklist patterns occurring in the string
  * (byte-level substring semantics ≡ per-pattern SQL `contains`) via
  * one Aho–Corasick pass — O(n + matches) per row regardless of the
  * pattern count, where a contains-join is O(P·n). The automaton is
  * built once on the driver and rides into generated code as a plan
  * reference object (same shipping model as a broadcast), so the
  * whole-stage-codegen span stays intact: the per-row call is one
  * non-virtual method on a pinned reference.
  */
case class AcMatchIdsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = AhoCorasick.build(patterns)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ac.matchIds(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.matchIds($c)")
  }
  override protected def withNewChildInternal(c: Expression): AcMatchIdsExpr =
    copy(child = c)
  override def prettyName: String = "ac_match_ids"
}

/** Rendezvous-hash shard id ([[Kernels.hrwShard]]) — stable elastic
  * sharding: n → n+1 moves only the keys the new shard wins.
  */
case class HrwShardExpr(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.hrwShard(input.asInstanceOf[Long], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hrwShard($c, $n, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): HrwShardExpr =
    copy(child = c)
  override def prettyName: String = "hrw_shard"
}

/** Deterministic shuffle key: mix64(key ⊕ mix64(salt)) reinterpreted
  * signed — sorting by it IS the epoch shuffle (a different salt per
  * epoch gives an independent permutation), with zero RNG state to
  * coordinate across executors. The salt's own mix is folded at
  * construction so the per-row cost is one xor + one mix64.
  */
case class ShuffleKeyExpr(child: Expression, salt: Long)
    extends UnaryExpression {
  private val saltMix = Kernels.mix64(salt)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.mix64(input.asInstanceOf[Long] ^ saltMix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.mix64($c ^ ${saltMix}L)")
  override protected def withNewChildInternal(c: Expression): ShuffleKeyExpr =
    copy(child = c)
  override def prettyName: String = "shuffle_key"
}

/** RFC 3986 syntax-based URL canonicalization + tracking-param strip
  * ([[Kernels.canonicalizeUrl]]) — the scan-stage dedup key for
  * URL-level dedup of a web corpus.
  */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.canonicalizeUrl(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.canonicalizeUrl($c)")
  override protected def withNewChildInternal(c: Expression): UrlCanonExpr =
    copy(child = c)
  override def prettyName: String = "url_canon"
}

/** Morton (Z-order) interleave of two long columns' low 32 bits — the
  * multi-dimensional layout sort key (see [[Kernels.interleave2]]).
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.interleave2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderExpr =
    copy(left = l, right = r)
  override def prettyName: String = "zorder_key"
}

/** Hilbert-curve index of (x, y) on the order-16 curve
  * ([[Kernels.hilbert2]]) — the locality-superior twin of
  * [[ZOrderExpr]]; scan-stage codegen.
  */
case class HilbertKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hilbert2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hilbert2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertKeyExpr =
    copy(left = l, right = r)
  override def prettyName: String = "hilbert_key"
}

/** Column-level API over the custom expressions — import
  * `graft.functions.dsl._` alongside `org.apache.spark.sql.functions._`.
  */
object dsl {
  val DefaultSeed = 42L

  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

  /** The expressions read ArrayData with typed getters, so a
    * wrong-typed child (e.g. SQL's default array<double> literals)
    * would yield garbage; inserting a Cast makes the analyzer coerce
    * or fail loudly instead.
    */
  private[graft] def asFloatArray(e: Expression): Expression =
    Cast(e, ArrayType(FloatType))
  private[graft] def asLongArray(e: Expression): Expression =
    Cast(e, ArrayType(LongType))
  private[graft] def asFloatMatrix(e: Expression): Expression =
    Cast(e, ArrayType(ArrayType(FloatType)))
  private[graft] def asBinary(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.BinaryType)
  private[graft] def asInt(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.IntegerType)

  def minhash_sig(c: Column, numHashes: Int, seed: Long = DefaultSeed): Column =
    ExpressionUtils.column(
      MinHashSigExpr(asLongArray(ExpressionUtils.expression(c)), numHashes, seed))

  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64Expr(asLongArray(ExpressionUtils.expression(c))))

  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(
      asFloatArray(ExpressionUtils.expression(a)),
      asFloatArray(ExpressionUtils.expression(b))))

  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      asFloatArray(ExpressionUtils.expression(a)),
      asFloatArray(ExpressionUtils.expression(b))))

  /** `cents` must be an array<array<float>> literal, `ids` a parallel
    * array<long> literal (the IVF codebook).
    */
  def nearest_centroids(v: Column, cents: Column, ids: Column, n: Int): Column =
    ExpressionUtils.column(NearestCentroidsExpr(
      asFloatArray(ExpressionUtils.expression(v)),
      asFloatMatrix(ExpressionUtils.expression(cents)),
      asLongArray(ExpressionUtils.expression(ids)), n))

  def srp_bucket(c: Column, bits: Int, seed: Long = DefaultSeed): Column =
    ExpressionUtils.column(
      SrpBucketExpr(asFloatArray(ExpressionUtils.expression(c)), bits, seed))

  def srp_probes(c: Column, bits: Int, seed: Long, nProbes: Int): Column =
    ExpressionUtils.column(SrpProbesExpr(
      asFloatArray(ExpressionUtils.expression(c)), bits, seed, nProbes))

  def shingle_set(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleSetExpr(ExpressionUtils.expression(text), n))

  def token_hashes(text: Column): Column =
    ExpressionUtils.column(TokenHashesExpr(ExpressionUtils.expression(text)))

  def char_ngram_set(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgramSetExpr(ExpressionUtils.expression(text), n))

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowExpr(ExpressionUtils.expression(text), k, w))

  def winnow_max_gap(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowGapExpr(ExpressionUtils.expression(text), k, w))

  /** Sorted distinct blocklist-pattern ids matched in `text` (one
    * Aho–Corasick pass; ids index into `patterns`).
    */
  def ac_match_ids(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      AcMatchIdsExpr(ExpressionUtils.expression(text), patterns))

  /** Rendezvous-hash shard id over a long key ([[Kernels.hrwShard]]). */
  def hrw_shard(key: Column, n: Int, seed: Long = DefaultSeed): Column = {
    import org.apache.spark.sql.types.LongType
    ExpressionUtils.column(HrwShardExpr(
      Cast(ExpressionUtils.expression(key), LongType), n, seed))
  }

  /** Deterministic epoch-shuffle sort key over a long key. */
  def shuffle_key(key: Column, salt: Long): Column = {
    import org.apache.spark.sql.types.LongType
    ExpressionUtils.column(ShuffleKeyExpr(
      Cast(ExpressionUtils.expression(key), LongType), salt))
  }

  /** Canonicalized URL dedup key ([[Kernels.canonicalizeUrl]]). */
  def url_canon(c: Column): Column =
    ExpressionUtils.column(UrlCanonExpr(ExpressionUtils.expression(c)))

  /** Morton (Z-order) key over two long columns' low 32 bits. */
  def zorder_key(a: Column, b: Column): Column = {
    import org.apache.spark.sql.types.LongType
    ExpressionUtils.column(ZOrderExpr(
      Cast(ExpressionUtils.expression(a), LongType),
      Cast(ExpressionUtils.expression(b), LongType)))
  }

  /** Hilbert-curve key over two long columns' low 16 bits (order-16
    * curve) — the locality-superior layout alternative to
    * [[zorder_key]].
    */
  def hilbert_key(a: Column, b: Column): Column = {
    import org.apache.spark.sql.types.LongType
    ExpressionUtils.column(HilbertKeyExpr(
      Cast(ExpressionUtils.expression(a), LongType),
      Cast(ExpressionUtils.expression(b), LongType)))
  }

  /** [n_lines, n_distinct_lines, dup_line_chars, total_line_chars]. */
  def line_stats(text: Column): Column =
    ExpressionUtils.column(LineStatsExpr(ExpressionUtils.expression(text)))

  /** [n_grams, n_distinct_grams, top_gram_count] for word n-grams. */
  def ngram_rep_stats(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramRepStatsExpr(ExpressionUtils.expression(text), n))

  /** Token windows of `chunk` tokens every `step` tokens. */
  def chunk_tokens(text: Column, chunk: Int, step: Int): Column =
    ExpressionUtils.column(ChunkTokensExpr(ExpressionUtils.expression(text), chunk, step))

  /** Exact-integer quality score ×10⁴ (one-pass kernel). */
  def quality_e4(text: Column): Column =
    ExpressionUtils.column(QualityE4Expr(ExpressionUtils.expression(text)))

  /** Unicode NFC canonical composition (pre-dedup normalization). */
  def nfc_normalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))

  /** Lowercased `\w+` word tokens (one-pass kernel). */
  def tokens_lower(text: Column): Column =
    ExpressionUtils.column(TokensLowerExpr(ExpressionUtils.expression(text)))

  /** [format, width, height, bit_depth] longs from container header
    * bytes; use `try_element_at` to project fields.
    */
  def media_header(payload: Column): Column =
    ExpressionUtils.column(MediaHeaderExpr(
      asBinary(ExpressionUtils.expression(payload))))

  def make_media_header(format: Column, w: Column, h: Column): Column =
    ExpressionUtils.column(MakeMediaHeaderExpr(
      asInt(ExpressionUtils.expression(format)),
      asInt(ExpressionUtils.expression(w)),
      asInt(ExpressionUtils.expression(h))))

  /** `nBands`-band long-count histogram of payload body bytes (bytes
    * after the container header) — scan-stage codegen.
    */
  def byte_histogram(payload: Column, nBands: Int): Column =
    ExpressionUtils.column(ByteHistogramExpr(
      asBinary(ExpressionUtils.expression(payload)), nBands))

  /** Perceptual dHash [hi, lo] longs of payload body bytes — the
    * image near-dup signature ([[Kernels.bodyDhash]]).
    */
  def body_dhash(payload: Column): Column =
    ExpressionUtils.column(BodyDhashExpr(
      asBinary(ExpressionUtils.expression(payload))))

  /** Mean body-byte intensity in [0,1] (grayscale-mean proxy). */
  def body_mean(payload: Column): Column =
    ExpressionUtils.column(BodyMeanExpr(
      asBinary(ExpressionUtils.expression(payload))))

  /** [format, sample_rate, channels, bits_per_sample, n_frames] longs
    * from audio container header bytes; use `try_element_at` to
    * project fields.
    */
  def audio_header(payload: Column): Column =
    ExpressionUtils.column(AudioHeaderExpr(
      asBinary(ExpressionUtils.expression(payload))))

  def make_audio_header(format: Column, rate: Column, channels: Column,
                        bits: Column, nFrames: Column): Column =
    ExpressionUtils.column(MakeAudioHeaderExpr(
      asInt(ExpressionUtils.expression(format)),
      asInt(ExpressionUtils.expression(rate)),
      asInt(ExpressionUtils.expression(channels)),
      asInt(ExpressionUtils.expression(bits)),
      Cast(ExpressionUtils.expression(nFrames),
        org.apache.spark.sql.types.LongType)))

  /** [format, mvhd_version, timescale, duration, n_tracks] from
    * ISO-BMFF bytes; element_at/try_element_at project fields.
    */
  def video_header(payload: Column): Column =
    ExpressionUtils.column(VideoHeaderExpr(
      asBinary(ExpressionUtils.expression(payload))))

  def make_video_header(format: Column, version: Column, timescale: Column,
                        duration: Column, nTracks: Column): Column =
    ExpressionUtils.column(MakeVideoHeaderExpr(
      asInt(ExpressionUtils.expression(format)),
      asInt(ExpressionUtils.expression(version)),
      asInt(ExpressionUtils.expression(timescale)),
      Cast(ExpressionUtils.expression(duration),
        org.apache.spark.sql.types.LongType),
      asInt(ExpressionUtils.expression(nTracks))))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCountExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Jaccard of two sorted distinct arrays: |∩| / (|a| + |b| − |∩|). */
  def sorted_jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{size => asize}
    val inter = sorted_intersect_count(a, b).cast("double")
    inter / (asize(a) + asize(b) - inter)
  }
}

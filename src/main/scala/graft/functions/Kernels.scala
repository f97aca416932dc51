package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** JVM kernels backing the custom Catalyst expressions. Kept as plain
  * static methods so generated code (doGenCode) can call them with one
  * non-virtual invocation per row — the loop itself runs as compiled
  * JVM code either way, and whole-stage codegen stays intact around it.
  *
  * All hash mixing is deterministic (fixed seeds), so results are
  * reproducible across partitions, executors, and runs — a hard
  * requirement for dedup at 100 TB where signatures computed on
  * different executors must agree.
  */
object Kernels {

  /** Finalizer from the SplitMix64 generator (public domain constant
    * schedule; same mixing used by java.util.SplittableRandom).
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Morton (Z-order) interleave of the low 32 bits of `a` (even bit
    * positions) and `b` (odd positions): the space-filling-curve sort
    * key for multi-dimensional data layout — files written in zkey
    * order get tight min/max ranges on BOTH dimensions, so point and
    * box predicates on either column prune file/row-group stats.
    */
  def interleave2(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 32) {
      out |= ((a >>> i) & 1L) << (2 * i) | ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Hilbert-curve index of (x, y) on the order-16 curve (the
    * 65536×65536 grid; inputs are masked to their low 16 bits) — the
    * classic xy2d walk (Hilbert 1891; the standard bit-twiddling form
    * with per-level rotation). Same job as [[interleave2]] with
    * strictly better locality: consecutive indices are ALWAYS
    * Manhattan-distance-1 grid neighbors (Z-order jumps across the
    * plane at quadrant seams, so a zkey file range can span far-apart
    * (x, y) boxes; an hkey range never does). All-integer and
    * fixed-order, so the 16 rotation levels unroll into the DuckDB
    * oracle verbatim.
    */
  def hilbert2(xIn: Long, yIn: Long): Long = {
    val n = 65536L
    var x = xIn & 0xffffL
    var y = yIn & 0xffffL
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** MinHash signature: for hash family i in [0, numHashes), the min
    * over the input token/shingle hashes of mix64(x ^ s_i). Empty
    * input → Long.MaxValue sentinel per slot.
    */
  def minhash(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val si = mix64(seed + i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = mix64(hashes.getLong(j) ^ si)
        if (h < min) min = h
        j += 1
      }
      sig(i) = min
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over token hashes: per-bit majority vote. */
  def simhash64(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Cosine similarity of two float vectors with double accumulation.
    * Dimension mismatch or zero-norm input → NaN (caller filters).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / math.sqrt(na * nb)
  }

  /** Dot product of two float vectors (double accumulation). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Hash of one lowercased alnum token span in `bytes` [from, until). */
  @inline private def tokenHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte // ascii lowercase
      h = (h ^ (b & 0xffL)) * FnvPrime
      i += 1
    }
    mix64(h)
  }

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** Per-token hashes of a UTF8 string, tokenized on non-alphanumeric
    * ASCII runs (the kernel form of `split(lower(text), "\\W+")` +
    * per-token hash — one pass over the bytes, no string allocation).
    */
  def tokenHashes(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isAlnum(bytes(i))) i += 1
      val start = i
      while (i < n && isAlnum(bytes(i))) i += 1
      if (i > start) out.add(tokenHash(bytes, start, i))
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Sorted distinct hashes of word `n`-gram shingles — the whole
    * tokenize→shingle→hash→distinct→sort pipeline in one allocation-
    * light pass (replaces an interpreted HOF chain measured ~1 ms/row;
    * this kernel is ~µs/row). Shorter-than-n documents hash their full
    * token sequence as a single shingle.
    */
  def shingleSet(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = tokenHashes(s)
    val nt = toks.numElements()
    val nsh = if (nt >= n) nt - n + 1 else 1
    val out = new Array[Long](nsh)
    var i = 0
    while (i < nsh) {
      var acc = FnvOffset
      var k = 0
      val m = if (nt >= n) n else nt
      while (k < m) { acc = mix64(acc ^ toks.getLong(i + k)); k += 1 }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, math.max(w, 0)))
  }

  /** Sorted distinct hashes of character `n`-grams (byte-windowed;
    * equivalent to char n-grams for ASCII text). Same one-pass shape
    * as [[shingleSet]].
    */
  def charNgramSet(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val ng = if (len >= n) len - n + 1 else 1
    val out = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var h = FnvOffset
      var k = 0
      val m = if (len >= n) n else len
      while (k < m) { h = (h ^ (bytes(i + k) & 0xffL)) * FnvPrime; k += 1 }
      out(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling
    * k-gram hashes, minimum per sliding window of `w`, distinct mins —
    * all in one pass over the bytes.
    */
  def winnow(s: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val nk = if (len >= k) len - k + 1 else 1
    val kh = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var h = FnvOffset
      var j = 0
      val m = if (len >= k) k else len
      while (j < m) { h = (h ^ (bytes(i + j) & 0xffL)) * FnvPrime; j += 1 }
      kh(i) = mix64(h)
      i += 1
    }
    val nw = if (nk >= w) nk - w + 1 else 1
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var min = Long.MaxValue
      var j = 0
      val m = if (nk >= w) w else nk
      while (j < m) { if (kh(i + j) < min) min = kh(i + j); j += 1 }
      mins(i) = min
      i += 1
    }
    java.util.Arrays.sort(mins)
    var wr = 0
    i = 0
    while (i < mins.length) {
      if (wr == 0 || mins(i) != mins(wr - 1)) { mins(wr) = mins(i); wr += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, wr))
  }

  /** Winnowing POSITION-guarantee probe (companion to [[winnow]]):
    * max gap between consecutive selected k-gram positions when each
    * sliding w-window selects its LEFTMOST minimal hash. Selected
    * positions are non-decreasing (a smaller hash earlier in the next
    * window would already have won the previous window), and the
    * Schleimer et al. SIGMOD'03 guarantee is that every w-window
    * contains a selection — i.e. this gap is ≤ w. Measured here, not
    * assumed, so the driver gate can pin it. ([[winnow]]'s by-VALUE
    * dedup never removes a position's value from the emitted set, so
    * the guarantee proved on positions transfers to the set.)
    * Returns 0 for texts with a single window.
    */
  def winnowMaxGap(s: org.apache.spark.unsafe.types.UTF8String,
                   k: Int, w: Int): Long = {
    val bytes = s.getBytes
    val len = bytes.length
    val nk = if (len >= k) len - k + 1 else 1
    val kh = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var h = FnvOffset
      var j = 0
      val m = if (len >= k) k else len
      while (j < m) { h = (h ^ (bytes(i + j) & 0xffL)) * FnvPrime; j += 1 }
      kh(i) = mix64(h)
      i += 1
    }
    val nw = if (nk >= w) nk - w + 1 else 1
    var maxGap = 0L
    var prevPos = -1
    i = 0
    while (i < nw) {
      var best = Long.MaxValue
      var bp = i
      var j = 0
      val m = if (nk >= w) w else nk
      while (j < m) {
        if (kh(i + j) < best) { best = kh(i + j); bp = i + j }
        j += 1
      }
      if (prevPos >= 0 && bp != prevPos && bp - prevPos > maxGap)
        maxGap = bp - prevPos
      prevPos = bp
      i += 1
    }
    maxGap
  }

  /** Intersection size of two SORTED, DISTINCT long arrays via linear
    * merge — replaces ArrayIntersect's boxed hash-set evaluation in
    * pairwise similarity joins (O(m+n), zero allocation).
    */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Intersection size of two SORTED, DISTINCT string arrays (binary
    * UTF8 order — the same order array_sort uses for StringType).
    */
  def sortedIntersectCountString(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Within-document repetition statistics (the Gopher/C4-style
    * boilerplate signal): over non-empty '\n'-separated lines, returns
    * [n_lines, n_distinct_lines, dup_line_chars, total_line_chars]
    * where dup_line_chars counts the characters of every occurrence
    * BEYOND the first of each repeated line. Exact string comparison
    * (not hashes) and codepoint character counts, so a SQL engine
    * reproduces the numbers bit-for-bit.
    */
  def lineStats(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val counts = new java.util.HashMap[String, Long]()
    var nLines = 0L
    var totalChars = 0L
    var dupChars = 0L
    val it = s.toString.split("\n", -1).iterator
    while (it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val chars = line.codePointCount(0, line.length).toLong
        nLines += 1
        totalChars += chars
        val prev = counts.merge(line, 1L, (a, b) => a + b)
        if (prev > 1L) dupChars += chars
      }
    }
    new GenericArrayData(
      Array(nLines, counts.size.toLong, dupChars, totalChars))
  }

  /** Lowercased word tokens as strings — the kernel form of
    * `filter(split(lower(text), "\\W+"), len > 0)` (ASCII `\w` = word
    * chars, multi-byte UTF-8 bytes are separators exactly like Java's
    * default non-Unicode `\W`). One byte pass; feeds explode-based
    * vocabulary/TF-IDF aggregations without the interpreted HOF chain.
    */
  /** Unicode NFC normalization (canonical composition) — the standard
    * pre-dedup text normalization: visually-identical strings whose
    * bytes differ only by composed-vs-decomposed accents (é vs e+U+0301)
    * collapse to one canonical byte form, so hash-based exact dedup
    * stops treating them as distinct documents. Backed by
    * `java.text.Normalizer` (ICU-equivalent tables shipped with the
    * JDK); already-NFC text (the common case — includes all ASCII)
    * passes `isNormalized` without allocating.
    */
  def nfcNormalize(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def tokensLower(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    // Unicode lowercase FIRST via UTF8String.toLowerCase — the SAME
    // call Spark's lower() makes, so the kernel matches lower()+split
    // semantics in every JVM locale (U+212A → ASCII 'k' joins tokens;
    // any residual locale sensitivity, e.g. tr-TR dotted-I, is shared
    // with Spark's own lower() and so cannot diverge from it)
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    @inline def isWord(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && !isWord(bytes(i))) i += 1
      val start = i
      while (i < n && isWord(bytes(i))) i += 1
      if (i > start)
        out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Word n-gram repetition signal (the Gopher "duplicate/top n-gram
    * fraction" boilerplate filters): over whitespace tokens, returns
    * [n_grams, n_distinct_grams, top_gram_count]. Exact string grams
    * (not hashes) so a SQL engine reproduces the counts bit-for-bit;
    * duplicate-occurrence count = n_grams − n_distinct_grams.
    */
  def ngramRepStats(s: org.apache.spark.unsafe.types.UTF8String,
                    n: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    val counts = new java.util.HashMap[String, Long]()
    var nGrams = 0L
    var top = 0L
    var i = 0
    while (i + n <= toks.length) {
      val gram = toks.slice(i, i + n).mkString(" ")
      nGrams += 1
      val c = counts.merge(gram, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array(nGrams, counts.size.toLong, top))
  }

  @inline private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** The 8 quality-score stopwords (must stay in sync with
    * graft.ops.TextOps.Stopwords and the quality_score DuckDB oracle).
    */
  @inline private def isStopword(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    val len = until - from
    if (len < 1 || len > 3) return false
    @inline def lc(i: Int): Int = {
      val b = bytes(from + i) & 0xff
      if (b >= 'A' && b <= 'Z') b + 32 else b
    }
    len match {
      case 1 => lc(0) == 'a'
      case 2 =>
        val a = lc(0); val b = lc(1)
        (a == 'o' && b == 'f') || (a == 't' && b == 'o') ||
          (a == 'i' && (b == 'n' || b == 's' || b == 't'))
      case _ =>
        val a = lc(0); val b = lc(1); val c = lc(2)
        (a == 't' && b == 'h' && c == 'e') ||
          (a == 'a' && b == 'n' && c == 'd')
    }
  }

  /** Exact-integer quality score ×10⁴ in ONE byte pass — the codegen
    * replacement for the interpreted split/filter/isInCollection HOF
    * chain (same integer math as the DuckDB oracle):
    *   score = 0.4·min(tc,100)/100 + 0.3·(len−p)/len + 0.3·min(5s,nt)/nt
    *   N10 = 4·min(tc,100)·len·nt + 300·(len−p)·nt + 300·min(5s,nt)·len
    *   D10 = 1000·len·nt, result = N10·10⁴ / D10 (long division =
    *   floor for non-negative operands).
    * len counts codepoints (non-continuation bytes), tokens split on
    * ASCII whitespace (Java \s), punctuation set [.,;:!?].
    */
  def qualityE4(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var chars = 0L; var punct = 0L; var tokens = 0L; var stop = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) chars += 1
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
        punct += 1
      i += 1
    }
    i = 0
    while (i < n) {
      while (i < n && isAsciiWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isAsciiWs(bytes(i))) i += 1
      if (i > start) {
        tokens += 1
        if (isStopword(bytes, start, i)) stop += 1
      }
    }
    val len = math.max(chars, 1L)
    val tc = tokens
    val nt = math.max(tc, 1L)
    val n10 = 4L * math.min(tc, 100L) * len * nt +
      300L * (len - punct) * nt + 300L * math.min(stop * 5L, nt) * len
    val d10 = 1000L * len * nt
    // floor of the DOUBLE quotient, exactly like the replaced HOF
    // implementation and the DuckDB oracle ((n10*10000)::DOUBLE / d10)
    // — exact long division could differ by 1 from the oracle when the
    // double numerator rounds (n10·10⁴ > 2^53 on multi-MB docs), and
    // the double product also cannot overflow the way n10 * 10000L can
    math.floor(n10.toDouble * 10000.0 / d10.toDouble).toLong
  }

  /** Token-window chunking (training-sequence prep): whitespace
    * tokens re-joined into windows of `chunk` tokens starting every
    * `step` tokens (overlap = chunk − step). One kernel pass instead
    * of an interpreted sequence/slice/concat HOF chain (~1 ms/row);
    * empty text → no chunks.
    */
  def chunkTokens(s: org.apache.spark.unsafe.types.UTF8String,
                  chunk: Int, step: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty)
      return new GenericArrayData(new Array[Any](0))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < toks.length) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(
        toks.slice(i, math.min(i + chunk, toks.length)).mkString(" "))
      i += step
    }
    new GenericArrayData(out.toArray)
  }

  // ------------------------------------------------------------------
  // Media container headers: parse + synthesize. Pure byte-level JVM
  // work — no codec library; dimensions live in the container header
  // (PNG IHDR, JPEG SOFn, BMP BITMAPINFOHEADER, GIF logical screen
  // descriptor), so width/height/bit-depth extraction needs no decode.
  // ------------------------------------------------------------------

  /** Media format codes returned by [[parseMediaHeader]]. */
  val FmtUnknown = 0L; val FmtPng = 1L; val FmtJpeg = 2L
  val FmtBmp = 3L; val FmtGif = 4L

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3))
  @inline private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  /** [format, width, height, bitDepth] from real container header
    * bytes; [0,0,0,0] for unrecognized/truncated/corrupt payloads
    * (never throws — a 100 TB media crawl always contains garbage).
    */
  def parseMediaHeader(b: Array[Byte]): ArrayData = {
    def out(f: Long, w: Long, h: Long, d: Long) =
      new GenericArrayData(Array(f, w, h, d))
    if (b == null || b.length < 10) return out(FmtUnknown, 0, 0, 0)
    // PNG: 8-byte signature, IHDR chunk first (len+type at 8..15,
    // width/height BE at 16/20, bit depth at 24)
    if (b.length >= 25 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
        u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return out(FmtPng, be32(b, 16), be32(b, 20), u8(b, 24).toLong)
    // JPEG: FFD8 then marker segments; dims are in the first SOFn
    // (C0..CF except C4/C8/CC): precision(1) height(2 BE) width(2 BE)
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xd9 || marker == 0xda) return out(FmtJpeg, 0, 0, 0)
        else {
          val len = be16(b, i + 2)
          if (len < 2) return out(FmtJpeg, 0, 0, 0)
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 9 < b.length)
              return out(FmtJpeg, be16(b, i + 7).toLong,
                be16(b, i + 5).toLong, u8(b, i + 4).toLong)
            return out(FmtJpeg, 0, 0, 0)
          }
          i += 2 + len
        }
      }
      return out(FmtJpeg, 0, 0, 0)
    }
    // BMP: "BM" + 12-byte file header, BITMAPINFOHEADER width/height
    // LE at 18/22 — both fields are SIGNED int32 (height negative =
    // top-down; a negative width is invalid per spec but appears in
    // hostile payloads, so it gets the same abs treatment rather than
    // surfacing as a 2^31..2^32 "unsigned" value), bpp at 28
    // (abs AFTER widening to Long: abs(Int.MinValue) is still negative)
    if (b(0) == 'B' && b(1) == 'M' && b.length >= 30)
      return out(FmtBmp, math.abs(le32(b, 18).toInt.toLong),
        math.abs(le32(b, 22).toInt.toLong),
        le16(b, 28).toLong)
    // GIF: "GIF87a"/"GIF89a" + logical screen w/h LE at 6/8, packed
    // color-depth byte at 10 (needs 11 bytes — one more than the
    // top-of-function minimum, so re-check before indexing)
    if (b.length >= 11 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return out(FmtGif, le16(b, 6).toLong, le16(b, 8).toLong,
        ((u8(b, 10) & 0x07) + 1).toLong)
    out(FmtUnknown, 0, 0, 0)
  }

  /** Byte length of the minimal synthesized container header for a
    * [[parseMediaHeader]] format code — where the payload BODY (pixel
    * data) begins for payloads built by [[makeMediaHeader]]. PNG 26
    * (signature + IHDR), JPEG 39 (SOI + APP0/JFIF + SOF0), BMP 54
    * (file header + BITMAPINFOHEADER), GIF 13 (signature + screen
    * descriptor). 0 for unknown formats (the whole payload is body).
    * Real-world containers have variable header lengths (PNG ancillary
    * chunks, JPEG APPn segments); a production splitter would walk the
    * chunk/segment grammar to the first data chunk instead.
    */
  def mediaBodyOffset(format: Long): Int = format match {
    case FmtPng => 26
    case FmtJpeg => 39
    case FmtBmp => 54
    case FmtGif => 13
    case _ => 0
  }

  /** `nBands`-band histogram (long counts) of the payload BODY bytes —
    * bytes after the container header ([[mediaBodyOffset]] of the
    * parsed format), band `(b * nBands) / 256`. The scan-stage codegen
    * form of the content-sniffer feature in
    * [[graft.ops.Multimodal.embedFeaturesBatched]]; null/empty/
    * header-only payloads yield all-zero counts (never throws).
    */
  def byteHistogram(b: Array[Byte], nBands: Int): ArrayData = {
    val counts = new Array[Long](nBands)
    if (b != null) {
      val off = mediaBodyOffset(parseMediaHeader(b).getLong(0))
      var i = off
      while (i < b.length) {
        counts(((b(i) & 0xff) * nBands) / 256) += 1L
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  /** Mean body-byte intensity in [0,1]: sum of payload bytes after the
    * container header / bodyLen / 255.0 — the grayscale-mean proxy of
    * [[graft.ops.Multimodal.decodeFeaturesBatched]]. 0.0 for
    * null/empty/header-only payloads.
    */
  def bodyByteMean(b: Array[Byte]): Double = {
    if (b == null) return 0.0
    val off = mediaBodyOffset(parseMediaHeader(b).getLong(0))
    val bodyLen = b.length - off
    if (bodyLen <= 0) return 0.0
    var sum = 0L
    var i = off
    while (i < b.length) { sum += b(i) & 0xff; i += 1 }
    sum.toDouble / bodyLen / 255.0
  }

  /** Perceptual difference-hash (dHash) of the payload body — the
    * image near-dup signature computed over the decoded-pixel stand-in
    * (body bytes after the container header; a real codec swaps in at
    * [[graft.ops.Multimodal.decodeFeaturesBatched]]'s documented
    * point and this kernel then runs over its luma grid instead).
    * The classic recipe on an 8×9 grid: the body is split into 72
    * equal position segments (position i → cell ⌊i·72/len⌋), each
    * cell summing its byte values; bit b (row r = b/8, col c = b%8)
    * is 1 iff cell[r·9+c] > cell[r·9+c+1] — horizontal gradient
    * signs, which survive brightness/scale shifts that break exact
    * hashing. Packed as [hi, lo] — two NON-NEGATIVE 32-bit halves in
    * longs, so band extraction and Hamming replay in any engine
    * without unsigned-64 gymnastics. All-integer, fixed-order: the
    * DuckDB oracle recomputes every bit. Null payload → null
    * (expression is null-safe); header-only/empty bodies yield the
    * degenerate all-zero signature callers must exclude (a flat
    * image has no gradient structure to hash).
    */
  def bodyDhash(b: Array[Byte]): ArrayData = {
    val off = mediaBodyOffset(parseMediaHeader(b).getLong(0))
    val len = b.length - off
    val cells = new Array[Long](72)
    var i = 0
    while (i < len) {
      cells(((i.toLong * 72L) / len).toInt) += (b(off + i) & 0xff).toLong
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var bit = 0
    while (bit < 64) {
      val r = bit / 8
      val c = bit % 8
      if (cells(r * 9 + c) > cells(r * 9 + c + 1)) {
        if (bit < 32) hi |= 1L << bit else lo |= 1L << (bit - 32)
      }
      bit += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** Minimal VALID container header bytes for (format, w, h) — the
    * synthesis side of the round-trip (tests + the DuckDB-checkable
    * header query). Formats: 1 PNG (depth 8), 2 JPEG (JFIF APP0 +
    * SOF0, depth 8), 3 BMP (24bpp), 4 GIF89a (depth 8).
    */
  def makeMediaHeader(format: Int, w: Int, h: Int): Array[Byte] = format match {
    case 1 =>
      val b = java.nio.ByteBuffer.allocate(26)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte)
      b.array()
    case 2 =>
      val b = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 17)
      b.put(0xff.toByte).put(0xd8.toByte)                       // SOI
      b.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort)  // APP0
        .put("JFIF".getBytes).put(new Array[Byte](10))
      // SOF0 len = 8 + 3 components x 3 bytes; standard YCbCr 4:2:0
      // specs so strict external decoders accept the frame header
      b.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort)  // SOF0
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
        .put(3.toByte)
        .put(1.toByte).put(0x22.toByte).put(0.toByte)           // Y
        .put(2.toByte).put(0x11.toByte).put(1.toByte)           // Cb
        .put(3.toByte).put(0x11.toByte).put(1.toByte)           // Cr
      b.array()
    case 3 =>
      val b = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1.toShort)
        .putShort(24.toShort)
      b.array()
    case 4 =>
      val b = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
        .put(0xf7.toByte).put(0.toByte).put(0.toByte)
      b.array()
    case _ => Array.emptyByteArray
  }

  // ------------------------------------------------------------------
  // Audio container headers: WAV (RIFF/WAVE chunk walk to fmt + data)
  // and FLAC (STREAMINFO bit-unpack). Like the image headers above,
  // sample rate / channels / bit depth / length live in the container
  // header, so extracting them needs byte arithmetic, not a codec.
  // ------------------------------------------------------------------

  /** Audio format codes returned by [[parseAudioHeader]]. */
  val AfmtUnknown = 0L; val AfmtWav = 1L; val AfmtFlac = 2L

  /** [format, sample_rate, channels, bits_per_sample, n_frames] from
    * real audio container header bytes; [0,0,0,0,0] for
    * unrecognized/truncated/corrupt payloads (never throws — a media
    * crawl always contains garbage). WAV walks the RIFF chunk list
    * (fmt may come after LIST/INFO chunks; odd chunk sizes are
    * word-padded) and derives n_frames from the `data` chunk SIZE
    * field over the fmt block-align — correct even when the sample
    * bytes themselves are absent or truncated. FLAC unpacks the
    * STREAMINFO bit layout (rate 20 bits, channels-1 3, bits-1 5,
    * total samples 36).
    */
  def parseAudioHeader(b: Array[Byte]): ArrayData = {
    def out(f: Long, r: Long, c: Long, d: Long, n: Long) =
      new GenericArrayData(Array(f, r, c, d, n))
    if (b == null || b.length < 12) return out(AfmtUnknown, 0, 0, 0, 0)
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var rate = 0L; var ch = 0L; var bits = 0L; var blockAlign = 0L
      var dataBytes = 0L; var haveFmt = false
      var corrupt = false
      while (!corrupt && i + 8 <= b.length) {
        val size = le32(b, i + 4)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
            b(i + 3) == ' ' && i + 8 + 16 <= b.length) {
          // PCM fmt chunk, all LE: audioFormat(2) channels(2) rate(4)
          // byteRate(4) blockAlign(2) bitsPerSample(2)
          ch = le16(b, i + 10).toLong
          rate = le32(b, i + 12)
          blockAlign = le16(b, i + 20).toLong
          bits = le16(b, i + 22).toLong
          haveFmt = true
        } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
            b(i + 3) == 'a') {
          dataBytes = size
        }
        // chunks are word-aligned: odd sizes carry one pad byte. The
        // advance is computed in Long: a hostile size whose Int sum
        // would wrap (e.g. 0x7FFFFFEC at offset 12) must END the walk,
        // not alias back into the buffer — so any declared size that
        // jumps past the payload stops here. Fields already read from
        // this chunk (a truncated trailing `data` size in particular)
        // are kept: real tools derive n_frames from the size field of
        // files whose sample bytes were cut off.
        val next = i.toLong + 8L + size + (size & 1L)
        if (size < 0 || next > b.length) corrupt = true
        else i = next.toInt
      }
      if (haveFmt)
        return out(AfmtWav, rate, ch, bits,
          if (blockAlign > 0) dataBytes / blockAlign else 0L)
      return out(AfmtWav, 0, 0, 0, 0)
    }
    // FLAC: "fLaC" magic + first metadata block STREAMINFO (type 0,
    // 34 bytes): minBlock(2) maxBlock(2) minFrame(3) maxFrame(3), then
    // 8 bit-packed bytes, then MD5(16)
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        b.length >= 8 + 18 && (u8(b, 4) & 0x7f) == 0) {
      val o = 8 + 10
      val rate = (u8(b, o).toLong << 12) | (u8(b, o + 1).toLong << 4) |
        (u8(b, o + 2) >> 4).toLong
      val ch = ((u8(b, o + 2) >> 1) & 0x7) + 1L
      val bits = (((u8(b, o + 2) & 0x1) << 4) | (u8(b, o + 3) >> 4)) + 1L
      val total = ((u8(b, o + 3) & 0xf).toLong << 32) |
        (u8(b, o + 4).toLong << 24) | (u8(b, o + 5).toLong << 16) |
        (u8(b, o + 6).toLong << 8) | u8(b, o + 7).toLong
      return out(AfmtFlac, rate, ch, bits, total)
    }
    out(AfmtUnknown, 0, 0, 0, 0)
  }

  /** Minimal VALID audio container header bytes for
    * (format, rate, channels, bits, nFrames) — the synthesis side of
    * the parse round-trip. Formats: 1 WAV (canonical 44-byte PCM
    * header; the data chunk SIZE is set but sample bytes are not
    * emitted — [[parseAudioHeader]] reads length from the size field,
    * as real tools do for truncated files), 2 FLAC (fLaC +
    * STREAMINFO).
    */
  def makeAudioHeader(format: Int, rate: Int, channels: Int, bits: Int,
                      nFrames: Long): Array[Byte] = format match {
    case 1 =>
      val blockAlign = channels * bits / 8
      val dataBytes = nFrames * blockAlign
      // RIFF32's chunk-size field is unsigned 32-bit: WAV cannot
      // represent > 4 GiB of sample data (the format limit RF64/W64
      // exist to lift) — fail loudly rather than wrap the size.
      // Values in (2^31, 2^32) still round-trip: the writer stores the
      // low 32 bits and parseAudioHeader reads the field unsigned.
      require(dataBytes <= 0xffffffffL,
        s"WAV data size $dataBytes exceeds the RIFF32 4 GiB limit " +
          "(use FLAC, or an RF64 writer, for longer payloads)")
      val b = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt((36 + dataBytes).toInt)
        .put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16)
        .putShort(1.toShort)                       // PCM
        .putShort(channels.toShort).putInt(rate)
        .putInt(rate * blockAlign)                 // byte rate
        .putShort(blockAlign.toShort).putShort(bits.toShort)
      b.put("data".getBytes).putInt(dataBytes.toInt)
      b.array()
    case 2 =>
      val b = java.nio.ByteBuffer.allocate(8 + 34)
      b.put("fLaC".getBytes)
      b.put(0x80.toByte)                           // last block, type 0
        .put(0.toByte).put(0.toByte).put(34.toByte)
      b.putShort(4096.toShort).putShort(4096.toShort) // min/max block
      b.put(new Array[Byte](6))                    // min/max frame size
      b.put((rate >> 12).toByte)
        .put(((rate >> 4) & 0xff).toByte)
        .put((((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
          (((bits - 1) >> 4) & 0x1)).toByte)
        .put(((((bits - 1) & 0xf) << 4) | ((nFrames >> 32) & 0xf).toInt)
          .toByte)
        .putInt((nFrames & 0xffffffffL).toInt)
      b.array()                                    // MD5 stays zeroed
    case _ => Array.emptyByteArray
  }

  // ------------------------------------------------------------------
  // Video container headers: ISO-BMFF (MP4/MOV) box walk to moov/mvhd.
  // Timescale/duration/track count live in the container header, so
  // extracting them needs byte arithmetic, not a codec — the video
  // sibling of the WAV/FLAC audio walk above.
  // ------------------------------------------------------------------

  /** Video format codes returned by [[parseVideoHeader]]. */
  val VfmtUnknown = 0L; val VfmtIsom = 1L; val VfmtQt = 2L

  /** [format, mvhd_version, timescale, duration, n_tracks] from
    * ISO-BMFF container bytes; [0,0,0,0,0] for unrecognized/truncated
    * payloads (never throws — a media crawl always contains garbage).
    * The first box must be `ftyp` (brand `qt  ` → format 2, any other
    * ISO brand → 1). The top-level walk honors the full box-size
    * grammar — 32-bit size, size==1 → 64-bit largesize, size==0 → box
    * extends to end of file — and descends one level into `moov` for
    * `mvhd` (version 0: 32-bit timescale/duration; version 1: 64-bit)
    * and the `trak` count. All offsets advance in Long (the WAV
    * chunk-walk overflow lesson, ADVICE r5): any declared size that
    * would jump past the payload ends the walk, keeping fields
    * already read — real tools extract what they can from truncated
    * downloads.
    */
  def parseVideoHeader(b: Array[Byte]): ArrayData = {
    def out(f: Long, v: Long, t: Long, d: Long, n: Long) =
      new GenericArrayData(Array(f, v, t, d, n))
    if (b == null || b.length < 16) return out(VfmtUnknown, 0, 0, 0, 0)
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return out(VfmtUnknown, 0, 0, 0, 0)
    val fmt = if (b(8) == 'q' && b(9) == 't' && b(10) == ' ' && b(11) == ' ')
      VfmtQt else VfmtIsom
    var version = 0L; var ts = 0L; var dur = 0L; var traks = 0L
    // (size, header-length) of the box at offset i within [i, end);
    // (-1, _) signals a malformed/overrunning box — the walk stops
    def boxAt(i: Long, end: Long): (Long, Long) = {
      val s32 = be32(b, i.toInt)
      if (s32 == 1L) {
        if (i + 16 > end) return (-1L, 0L)
        val s64 = ((u8(b, i.toInt + 8).toLong << 56) |
          (u8(b, i.toInt + 9).toLong << 48) |
          (u8(b, i.toInt + 10).toLong << 40) |
          (u8(b, i.toInt + 11).toLong << 32) | be32(b, i.toInt + 12))
        // a top-bit-set largesize lands negative and fails s < hdr
        if (s64 < 16L || i + s64 > end) (-1L, 0L) else (s64, 16L)
      } else if (s32 == 0L) (end - i, 8L)
      else if (s32 < 8L || i + s32 > end) (-1L, 0L)
      else (s32, 8L)
    }
    var i = 0L
    var corrupt = false
    while (!corrupt && i + 8 <= b.length) {
      val (size, hdr) = boxAt(i, b.length.toLong)
      if (size < 0) corrupt = true
      else {
        val t0 = i.toInt + 4
        if (b(t0) == 'm' && b(t0 + 1) == 'o' && b(t0 + 2) == 'o' &&
            b(t0 + 3) == 'v') {
          val end = i + size
          var j = i + hdr
          while (!corrupt && j + 8 <= end) {
            val (cs, chdr) = boxAt(j, end)
            if (cs < 0) corrupt = true
            else {
              val c0 = j.toInt + 4
              if (b(c0) == 'm' && b(c0 + 1) == 'v' && b(c0 + 2) == 'h' &&
                  b(c0 + 3) == 'd' && j + chdr + 4 <= end) {
                val p = (j + chdr).toInt
                val ver = u8(b, p)
                if (ver == 0 && j + chdr + 20 <= end) {
                  version = 0; ts = be32(b, p + 12); dur = be32(b, p + 16)
                } else if (ver == 1 && j + chdr + 32 <= end) {
                  version = 1; ts = be32(b, p + 20)
                  dur = ((be32(b, p + 24) << 32) | be32(b, p + 28))
                }
              } else if (b(c0) == 't' && b(c0 + 1) == 'r' &&
                  b(c0 + 2) == 'a' && b(c0 + 3) == 'k') {
                traks += 1
              }
              j += cs
            }
          }
        }
        i += size
      }
    }
    out(fmt, version, ts, dur, traks)
  }

  /** Minimal VALID ISO-BMFF bytes for (format, mvhdVersion, timescale,
    * duration, nTracks) — the synthesis side of the parse round-trip:
    * canonical `ftyp` (brand isom/qt, no compatible-brand list), then
    * `moov` holding a spec-sized `mvhd` (108 bytes at version 0, 120
    * at version 1 — rate/volume/matrix fields zeroed) and `nTracks`
    * empty `trak` boxes (the walk reads the box headers only; real
    * files put tkhd/mdia children inside). Version 0 stores 32-bit
    * durations — longer payloads must use version 1, enforced loudly
    * like the WAV RIFF32 cap.
    */
  def makeVideoHeader(format: Int, version: Int, timescale: Int,
                      duration: Long, nTracks: Int): Array[Byte] = {
    if (format < 1 || format > 2) return Array.emptyByteArray
    require(version == 0 || version == 1,
      s"mvhd version must be 0 or 1, got $version")
    require(version == 1 || duration <= 0xffffffffL,
      s"mvhd v0 duration is 32-bit; $duration needs version 1")
    require(nTracks >= 0, "nTracks must be non-negative")
    val mvhdSize = 8 + (if (version == 0) 100 else 112)
    val moovSize = 8 + mvhdSize + nTracks * 8
    val buf = java.nio.ByteBuffer.allocate(16 + moovSize) // BE default
    buf.putInt(16).put("ftyp".getBytes)
      .put((if (format == 2) "qt  " else "isom").getBytes).putInt(0)
    buf.putInt(moovSize).put("moov".getBytes)
    buf.putInt(mvhdSize).put("mvhd".getBytes)
    buf.putInt(version << 24) // version byte + zero flags
    if (version == 0)
      buf.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
    else
      buf.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
    buf.position(buf.position() + 80) // rate..next_track_id, zeroed
    for (_ <- 0 until nTracks) buf.putInt(8).put("trak".getBytes)
    buf.array()
  }

  /** Ids of the `n` nearest centroids to `v` by cosine similarity
    * (ties → smaller id first), over a LITERAL codebook
    * (array<array<float>> + parallel array<long> of ids). One pass, no
    * allocation beyond the n-slot result — this is IVF list assignment
    * as a scan-stage argmax instead of a corpus×centroids join + window
    * (which shuffles and sorts n×|codebook| rows to keep one). NaN
    * similarities (zero-norm or dim-mismatch vectors) are skipped.
    */
  def nearestCentroids(v: ArrayData, cents: ArrayData, ids: ArrayData,
                       n: Int): ArrayData = {
    val m = cents.numElements()
    val k = math.min(n, m)
    if (k <= 0) return new GenericArrayData(new Array[Long](0))
    val topSim = new Array[Double](k)
    val topId = new Array[Long](k)
    var filled = 0
    var i = 0
    while (i < m) {
      val s = cosine(v, cents.getArray(i))
      if (!java.lang.Double.isNaN(s)) {
        val id = ids.getLong(i)
        // insertion position in (sim desc, id asc) order
        var pos = filled
        while (pos > 0 && (topSim(pos - 1) < s ||
            (topSim(pos - 1) == s && topId(pos - 1) > id))) pos -= 1
        if (pos < k) {
          var j = math.min(filled, k - 1)
          while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
          topSim(pos) = s
          topId(pos) = id
          if (filled < k) filled += 1
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  /** Random-hyperplane LSH bucket for a float vector: `bits` sign bits,
    * hyperplane components drawn from fixed SplitMix64 streams (Gaussian
    * via Box-Muller is unnecessary — sign of a symmetric ±1 projection
    * preserves the SimHash/SRP-LSH guarantee).
    */
  def srpBucket(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        // deterministic ±1 component for (bit b, dim i)
        val r = mix64(seed + b * 131071L + i)
        val comp = if ((r & 1L) == 0L) 1.0 else -1.0
        acc += comp * v.getFloat(i)
        i += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Query-directed multi-probe sequence for [[srpBucket]] (Lv et al.,
    * VLDB'07 adapted to signed random projections): the `nProbes`
    * bucket ids most likely to hold a query's near neighbors, ordered
    * by flip cost — the sum of |hyperplane projection| over flipped
    * bits. probes[0] is always the query's own bucket (cost 0); a
    * 2-bit flip of two near-boundary planes outranks a 1-bit flip of a
    * confident plane, which is exactly the headroom uniform
    * single-bit-flip probing leaves on the table. Same (seed, bit,
    * dim) hyperplane stream as [[srpBucket]], so probes land in REAL
    * index buckets.
    *
    * Cost: enumerates the 2^bits flip masks per call — bounded by the
    * `bits <= 12` guard and only ever computed QUERY-side (the
    * corpus-side index stays one bucket per (table, vector)).
    */
  def srpProbes(v: ArrayData, bits: Int, seed: Long, nProbes: Int): ArrayData = {
    require(bits >= 1 && bits <= 12,
      s"srp_probes enumerates 2^bits flip masks; bits=$bits outside [1,12]")
    val n = v.numElements()
    val cost = new Array[Double](bits)
    var base = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val r = mix64(seed + b * 131071L + i)
        acc += (if ((r & 1L) == 0L) 1.0 else -1.0) * v.getFloat(i)
        i += 1
      }
      cost(b) = math.abs(acc)
      if (acc >= 0) base |= (1L << b)
      b += 1
    }
    val m = 1 << bits
    val score = new Array[Double](m)
    var mask = 1
    while (mask < m) {
      // score via lowest set bit: O(2^bits) total, no inner loop
      val low = java.lang.Integer.numberOfTrailingZeros(mask)
      score(mask) = score(mask & (mask - 1)) + cost(low)
      mask += 1
    }
    val order = (0 until m).sortBy(mk => (score(mk), mk)) // mask tie-break: deterministic
    val t = math.max(1, math.min(nProbes, m))
    val out = new Array[Long](t)
    var k = 0
    while (k < t) { out(k) = base ^ order(k).toLong; k += 1 }
    new GenericArrayData(out)
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar, IEEE ToN 1998): shard = argmax over s < n of
    * mix64(key ⊕ mix64(seed + s)), unsigned comparison, smaller s on
    * (astronomically unlikely) ties.
    *
    * The property that matters at fleet scale: growing n → n+1
    * reassigns EXACTLY the keys whose new shard is the new one —
    * every other key's argmax is unchanged — so elastic re-sharding
    * moves ~1/(n+1) of the data, where mod-n hashing reshuffles
    * (n-1)/n of it. Pure per-row arithmetic: deterministic across
    * executors, zero state, zero shuffle to compute.
    */
  def hrwShard(key: Long, n: Int, seed: Long): Int = {
    // n <= 0 would silently route every row to shard 0 (the s=0 score
    // is computed unconditionally) — a miscomputed shard count must
    // fail loudly, not converge the fleet onto one shard
    require(n >= 1, s"hrw_shard needs n >= 1 shards, got $n")
    var best = 0
    var bestScore = mix64(key ^ mix64(seed))
    var s = 1
    while (s < n) {
      val sc = mix64(key ^ mix64(seed + s))
      if (java.lang.Long.compareUnsigned(sc, bestScore) > 0) {
        best = s; bestScore = sc
      }
      s += 1
    }
    best
  }

  /** Canonicalize an http(s) URL for dedup keying — the standard
    * normalizations that make syntactically-different spellings of
    * the same resource collide (RFC 3986 §6 syntax-based
    * normalization plus the tracking-param strip every web-corpus
    * pipeline applies):
    *
    *  1. scheme and host lowercased (case-insensitive per RFC);
    *  2. default port stripped (`:443` for https, `:80` for http);
    *  3. runs of `/` in the path collapsed to one;
    *  4. trailing `/` dropped (a bare `/` path is dropped too — host
    *     root canonicalizes to no path);
    *  5. fragment dropped (never sent to the server);
    *  6. query params with keys starting `utm_` dropped, the rest
    *     sorted bytewise and rejoined; an emptied query drops its `?`.
    *
    * Total: any input without `://` (or with an empty host) is
    * returned unchanged rather than throwing — hostile rows pass
    * through and collide only with themselves. Userinfo (`@`) and
    * IPv6 bracket hosts are out of scope (treated as part of the
    * host token, lowercased but otherwise preserved). Idempotent by
    * construction (property-tested), which is what lets the key be
    * recomputed at any pipeline stage without drift.
    */
  def canonicalizeUrl(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = u.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return u
    val scheme = s.substring(0, schemeEnd)
      .toLowerCase(java.util.Locale.ROOT)
    var i = schemeEnd + 3
    val n = s.length
    var hostEnd = i
    while (hostEnd < n && s.charAt(hostEnd) != '/' &&
      s.charAt(hostEnd) != '?' && s.charAt(hostEnd) != '#') hostEnd += 1
    var hostPort = s.substring(i, hostEnd)
      .toLowerCase(java.util.Locale.ROOT)
    if (hostPort.isEmpty) return u
    if ((scheme == "https" && hostPort.endsWith(":443")) ||
        (scheme == "http" && hostPort.endsWith(":80")))
      hostPort = hostPort.substring(0, hostPort.lastIndexOf(':'))
    i = hostEnd
    var pathEnd = i
    while (pathEnd < n && s.charAt(pathEnd) != '?' &&
      s.charAt(pathEnd) != '#') pathEnd += 1
    val path = {
      val sb = new java.lang.StringBuilder(pathEnd - i)
      var j = i
      while (j < pathEnd) {
        val c = s.charAt(j)
        if (c != '/' || sb.length == 0 || sb.charAt(sb.length - 1) != '/')
          sb.append(c)
        j += 1
      }
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '/')
        sb.setLength(sb.length - 1)
      sb.toString
    }
    var queryEnd = pathEnd
    val query =
      if (pathEnd < n && s.charAt(pathEnd) == '?') {
        queryEnd = pathEnd + 1
        while (queryEnd < n && s.charAt(queryEnd) != '#') queryEnd += 1
        val params = s.substring(pathEnd + 1, queryEnd).split("&", -1)
          .filter(p => p.nonEmpty && !p.startsWith("utm_"))
        java.util.Arrays.sort(params.asInstanceOf[Array[Object]])
        if (params.isEmpty) "" else "?" + params.mkString("&")
      } else ""
    org.apache.spark.unsafe.types.UTF8String.fromString(
      scheme + "://" + hostPort + path + query)
  }
}

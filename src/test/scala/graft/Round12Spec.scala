package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Round-12 closers: the derived-index filter-copy, the forget loop's
  * distributed anti-join + zero-norm guard, the LSH-prefiltered
  * set-similarity rung, and the truncated-dims IVF serving gate. Each
  * test brute-forces or cross-checks independently — never a copied
  * expected value.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def vec(axis: Int, eps: Float): Seq[Float] = {
    val v = Array.fill(4)(eps)
    v(axis) = 1f
    v.toSeq
  }

  private def emb(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, vec((i % 4).toInt, 0.01f * (i % 3))))
      .toDF("vec_id", "embedding")
  }

  private def content(dirPath: String): Set[(Long, Long)] =
    spark.read.parquet(dirPath)
      .select(col("cid").cast("long"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ivfIndexDerive: a filter-copy equals a from-raw build of the " +
      "same subset, row for row, and keeps the partitioned layout") {
    val src = Files.createTempDirectory("ivf_dsrc").toString
    val dst = Files.createTempDirectory("ivf_ddst").toString
    val rebuilt = Files.createTempDirectory("ivf_dreb").toString
    val all = (0L until 40L)
    val codebook = Array(0L, 1L, 2L, 3L)
      .map(i => (i, vec((i % 4).toInt, 0.01f * (i % 3))))
    Similarity.ivfIndexWriteWithCodebook(
      emb(all), "vec_id", "embedding", src, codebook)
    Similarity.ivfIndexDerive(spark, src, dst, col("cid") % 7 =!= 0)
    Similarity.ivfIndexWriteWithCodebook(
      emb(all.filter(_ % 7 != 0)), "vec_id", "embedding", rebuilt,
      codebook)
    assert(content(dst) == content(rebuilt),
      "derived subset must equal a from-raw build of the same subset")
    // layout: still partitioned by list id (the pruned-read contract)
    val parts = new java.io.File(dst).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(parts.nonEmpty && parts.forall(_.startsWith("centroid_id=")),
      s"derived index lost the by-list layout: $parts")
    // a keep-everything derive is a faithful copy
    val copy = Files.createTempDirectory("ivf_dcopy").toString
    Similarity.ivfIndexDerive(spark, src, copy, lit(true))
    assert(content(copy) == content(src))
  }

  test("ivfIndexForget: a corpus-proportional forget batch (the " +
      "anti-join path) and a zero-norm vector in the batch both " +
      "resolve to rebuild-from-survivors") {
    val base = Files.createTempDirectory("ivf_f2base").toString
    val rebuilt = Files.createTempDirectory("ivf_f2reb").toString
    val all = (0L until 40L)
    val codebook = Array(0L, 1L, 2L, 3L)
      .map(i => (i, vec((i % 4).toInt, 0.01f * (i % 3))))
    Similarity.ivfIndexWriteWithCodebook(
      emb(all), "vec_id", "embedding", base, codebook)
    // ~25% of the corpus — the scale the inlined In-list was a driver
    // hazard for — PLUS a zero-norm vector (NaN cosine to every
    // centroid → null assignment; it lives in no list, so it must be
    // skipped, not NPE)
    import spark.implicits._
    val forget = emb(all.filter(_ % 4 == 1))
      .unionByName(Seq((999L, Seq(0f, 0f, 0f, 0f)))
        .toDF("vec_id", "embedding"))
    Similarity.ivfIndexForget(spark, base, codebook,
      forget, "vec_id", "embedding")
    Similarity.ivfIndexWriteWithCodebook(
      emb(all.filter(_ % 4 != 1)), "vec_id", "embedding", rebuilt,
      codebook)
    assert(content(base) == content(rebuilt),
      "forgotten index must equal a rebuild from survivors")
  }

  test("ppjoin_lsh reproduces ppjoin_pairs' exact pair set — LSH " +
      "candidate completeness at the 0.5 operating point") {
    def pairs(df: org.apache.spark.sql.DataFrame)
        : Map[(Long, Long), Double] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(queries.ScaleQueries.queries("ppjoin_pairs")(spark, dir))
    val lsh = pairs(queries.ScaleQueries.queries("ppjoin_lsh")(spark, dir))
    assert(lsh.keySet == exact.keySet,
      s"pair sets differ: lsh-only ${(lsh.keySet -- exact.keySet).take(3)}, " +
        s"exact-only ${(exact.keySet -- lsh.keySet).take(3)}")
    // jaccard values agree (hashed-shingle vs string-shingle parity)
    for ((k, v) <- exact)
      assert(math.abs(lsh(k) - v) < 1e-9, s"jaccard differs at $k")
  }

  test("ann_mrl_funnel: measurement row is internally consistent and " +
      "matches a brute-force funnel replay") {
    val row = queries.ScaleQueries.queries("ann_mrl_funnel")(spark, dir)
      .head()
    val nQ = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 20 === 0).count()
    assert(row.getAs[Int]("short_k") == 32)
    assert(row.getAs[Long]("n_exact") == 3 * nQ)
    val hits = row.getAs[Long]("hits")
    assert(hits >= 0 && hits <= row.getAs[Long]("n_exact"))
    assert(row.getAs[Long]("recall_e6") ==
      hits * 1000000L / row.getAs[Long]("n_exact"))
    // brute replay: exact full-dim top-3 per query, then the count of
    // those that the funnel's top-3 (prefix-IVF shortlist @32,
    // full-dim re-rank) recovers — mirrors the DuckDB oracle in Scala
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until d) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i) }
      math.round(ab / math.sqrt(aa * bb) * 1e4) / 1e4
    }
    def top(qid: Long, pool: Iterable[Long], d: Int, k: Int): Seq[Long] =
      pool.filter(_ != qid).toSeq
        .map(c => (c, cos(vecs(qid), vecs(c), d)))
        .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1)
    // stage 1 brute twin: prefix codebook + assignment + half probes
    val n = vecs.size.toLong
    val stride = graft.ops.Similarity.sqrtStride(n)
    val cents = vecs.keys.filter(_ % stride == 0).toSeq.sorted.take(1 << 14)
    def rawCos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until 16) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i) }
      ab / math.sqrt(aa * bb)
    }
    def ranked(v: Array[Double]): Seq[Long] =
      cents.map(c => (c, rawCos(v, vecs(c))))
        .filterNot(_._2.isNaN)
        .sortBy { case (c, s) => (-s, c) }.map(_._1)
    val assign = vecs.keys.map(id => id -> ranked(vecs(id)).head).toMap
    val nprobe = graft.ops.Similarity.halfNprobe(cents.size)
    val qids = vecs.keys.filter(_ % 20 == 0).toSeq
    val bruteHits = qids.map { q =>
      val probed = ranked(vecs(q)).take(nprobe).toSet
      val candPool = vecs.keys.filter(c => c != q && probed(assign(c)))
      val short = top(q, candPool, 16, 32)
      val funnel3 = top(q, short, 64, 3).toSet
      (funnel3 & top(q, vecs.keys, 64, 3).toSet).size
    }.sum
    assert(hits == bruteHits, s"funnel hits $hits != brute $bruteHits")
  }

  test("dedup_provenance: every survivor carries exactly its " +
      "cluster's sorted distinct source union; members total corpus") {
    val texts = docTexts()
    val brute = lshBruteLabels(texts, _ => true)
    val meta = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val byCluster = meta.keys.groupBy(id => brute.getOrElse(id, id))
    val got = queries.ScaleQueries.queries("dedup_provenance")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet == byCluster.keySet)
    for ((c, ids) <- byCluster) {
      val srcs = ids.map(meta(_)._1).toSeq.distinct.sorted
      val langs = ids.map(meta(_)._2).toSet
      val (keep, n, prov, nSrc, nLang) = got(c)
      assert(keep == ids.min)
      assert(n == ids.size.toLong)
      assert(prov == srcs.mkString(","),
        s"cluster $c provenance $prov != ${srcs.mkString(",")}")
      assert(nSrc == srcs.size.toLong && nLang == langs.size.toLong)
    }
    assert(got.values.map(_._2).sum == meta.size.toLong)
  }

  private def docTexts(): Map[Long, String] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Same brute closure as Round11CloserSpec's (duplicated because
    * suites must stay independent).
    */
  private def lshBruteLabels(docText: Map[Long, String],
                             only: Long => Boolean): Map[Long, Long] = {
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val keep = docText.keys.filter(only).toSeq.sorted
    val sh = keep.map(id => id -> shingles(docText(id))).toMap
    val parent = scala.collection.mutable.Map(keep.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for (a <- keep; b <- keep if b > a) {
      val inter = (sh(a) & sh(b)).size
      val uni = (sh(a) | sh(b)).size
      if (uni > 0 && inter.toDouble / uni >= 0.7) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    keep.map(i => i -> find(i)).toMap
  }

  test("cc_forget: maintained labels under deletion equal a brute " +
      "rebuild over survivors, and the maintenance path engages") {
    val texts = docTexts()
    val survivors = texts.filter { case (id, _) => id % 13 != 5 }
    val brute = lshBruteLabels(survivors, _ => true)
    // rebuild convention: labels only for nodes in >= 1 pair
    val paired = brute.filter { case (id, root) =>
      brute.exists { case (o, r) => o != id && r == root }
    }
    val got = queries.ScaleQueries.queries("cc_forget")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == paired,
      s"only-got ${(got.toSet -- paired.toSet).take(3)}, " +
        s"only-brute ${(paired.toSet -- got.toSet).take(3)}")
    // the maintenance path must actually have had work: at least one
    // pre-deletion cluster contained a forgotten doc
    val full = lshBruteLabels(texts, _ => true)
    assert(texts.keys.exists(id => id % 13 == 5 &&
        texts.keys.exists(o => o != id && full(o) == full(id))),
      "corpus regen removed every forgotten-in-cluster case — the " +
        "maintenance path went unexercised")
  }

  test("ann_filtered: every hit shares its query's label, and recall " +
      "vs the brute filtered top-3 clears the gate floor") {
    val meta = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray)).toMap
    val got = queries.ScaleQueries.queries("ann_filtered")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (q, c) =>
      assert(meta(q)._1 == meta(c)._1,
        s"hit ($q, $c) crosses labels ${meta(q)._1} != ${meta(c)._1}")
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- a.indices) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i)
      }
      math.round(ab / math.sqrt(aa * bb) * 1e4) / 1e4
    }
    val qids = meta.keys.filter(_ % 20 == 0).toSeq
    val exact = qids.flatMap { q =>
      meta.keys
        .filter(c => c != q && meta(c)._1 == meta(q)._1).toSeq
        .map(c => (c, cos(meta(q)._2, meta(c)._2)))
        .sortBy { case (c, sv) => (-sv, c) }.take(3).map(c => (q, c._1))
    }.toSet
    val recall = (got.toSet & exact).size.toDouble / exact.size
    // r13: the occupancy-aware filteredNprobe budget raised the gate
    // floor 70 → 80 (measured 0.95 at all SFs)
    assert(recall >= 0.8, s"filtered recall $recall below floor")
    val gate = queries.ScaleQueries.queries("ann_filtered_recall")(
      spark, dir).head()
    assert(gate.getInt(2) == 1, "floor_met must be 1")
  }

  test("grad_accum_equiv: shard cells sum exactly to the full batch") {
    val rows = queries.TextQueries.queries("grad_accum_equiv")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(-1L, 0L, 1L, 2L, 3L))
    rows.foreach(r => assert(r.getAs[Int]("accum_equal") == 1))
    val total = rows.find(_.getLong(0) == -1L).get
    val shards = rows.filter(_.getLong(0) >= 0L)
    for (c <- Seq("g0_e12", "g1_e12", "g2_e12", "g3_e12", "g4_e12",
        "sse_e12", "n"))
      assert(shards.map(_.getAs[Long](c)).sum == total.getAs[Long](c),
        s"cell $c does not accumulate")
    assert(total.getAs[Long]("n") ==
      Tables(spark, dir, "documents").count())
  }

  test("maxsim_budget_curve: monotone nondecreasing, and the " +
      "half-coverage point reproduces maxsim_ivf's serving recall") {
    val rows = queries.ScaleQueries.queries("maxsim_budget_curve")(
      spark, dir).collect()
    assert(rows.length == 3)
    val recalls = rows.map(_.getAs[Long]("recall_e6"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"curve not monotone: ${recalls.toSeq}")
    // the curve's max-budget point IS the serving config: its hit
    // count must equal the recall maxsim_ivf's approx route achieves
    val exact = queries.ScaleQueries.maxsimRank(spark, dir)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = queries.ScaleQueries.maxsimIvfApprox(spark, dir)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val servingHits = (approx & exact).size.toLong
    assert(rows.last.getAs[Long]("hits") == servingHits,
      s"curve@max ${rows.last.getAs[Long]("hits")} != serving $servingHits")
    rows.foreach(r =>
      assert(r.getAs[Long]("n_exact") == exact.size.toLong))
  }

  test("ann_ivf_mrl: full per-point coverage, floor met, and the " +
      "approx recall really clears the 80% floor vs a brute prefix " +
      "ranking") {
    val rows = queries.ScaleQueries.queries("ann_ivf_mrl")(spark, dir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 32))
    val nQ = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 20 === 0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") == nQ, "gate must cover every query")
      assert(r.getAs[Int]("recall_floor_pct") == 80)
      assert(r.getAs[Int]("floor_met") == 1)
    }
    // independent recall check at d=16: brute prefix top-3 vs the
    // served IVF top-3 (the gate only pins the floor bit)
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos16(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until 16) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i)
      }
      math.round(ab / math.sqrt(aa * bb) * 1e4) / 1e4
    }
    val qids = vecs.keys.filter(_ % 20 == 0).toSeq
    val exact = qids.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos16(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(c => (q, c._1))
    }.toSet
    val n = Tables(spark, dir, "embeddings").count()
    val sliced = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        slice(col("embedding").cast("array<float>"), 1, 16).as("pv"))
    val cb = Similarity.sampledCodebook(sliced, "vec_id", "pv",
      Similarity.sqrtStride(n))
    val approx = Similarity.ivfTopKWithCodebook(sliced, "vec_id", "pv",
        queryPred = col("vec_id") % 20 === 0, k = 3,
        nprobe = Similarity.halfNprobe(cb.length), codebook = cb)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"d=16 recall $recall below the gate floor")
  }
}

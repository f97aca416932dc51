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

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same session shape as Verify: functions + optimizer rules
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so the first timed query doesn't absorb JVM
    // startup: touch the aggregate/join/shuffle machinery once, plus
    // the embeddings/documents parquet footers and one custom kernel
    // expression — `ann_ivf`/`agg_cube` kept landing in "noisy" purely
    // because whichever family ran first paid the cold parquet footer
    // read + kernel classloading for everyone else.
    try {
      spark.range(0, 2000000).selectExpr("sum(id)", "count(distinct id % 7)")
        .collect()
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.join(w.limit(1), Seq("r_regionkey"), "left_semi").count()
      GraftExtensions.register(spark)
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .selectExpr("cosine_sim(embedding, embedding)").count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .selectExpr("simhash64(token_hashes(text))").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
      spark.read.parquet(s"$sfDir/orders.parquet").limit(1).count()
      spark.read.parquet(s"$sfDir/events.parquet").limit(1).count()
    } catch { case _: Throwable => () }
    // optional comma-separated query filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Runs per query; the per-query value reported is best-of-N so a
    // single GC pause / JIT recompile can't masquerade as a plan
    // regression. Raw samples ride along in "samples" and queries with
    // >2x spread are named in "noisy", so a reader can tell noise from
    // regression without rerunning.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    // A failed run's duration is meaningless (a fast throw would win
    // the best-of-N min and report a broken query as a speedup), so
    // runs are timed only when they complete; queries with zero
    // completed runs report -1 and are named in "failed".
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val times = (1 to repeat).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            None
          }
        }
        name -> times
      }
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    def best(ts: Seq[Double]): Double = if (ts.isEmpty) -1.0 else r3(ts.min)
    val qs = results.map { case (k, ts) => s""""$k":${best(ts)}""" }
      .mkString("{", ",", "}")
    val samples = results
      .map { case (k, ts) => s""""$k":[${ts.map(r3).mkString(",")}]""" }
      .mkString("{", ",", "}")
    val noisy = results
      .collect { case (k, ts)
        if ts.nonEmpty && ts.max > 2 * ts.min && ts.max - ts.min > 0.25 =>
          s""""$k"""" }
      .mkString("[", ",", "]")
    val failed = results.collect { case (k, ts) if ts.isEmpty => s""""$k"""" }
      .mkString("[", ",", "]")
    val total = r3(results.flatMap(_._2.minOption).sum)
    // The 41 queries of the round-1 suite (CORRECTNESS_r01.json): the
    // only set for which a like-for-like total exists across every
    // round, so the perf gate can compare 41-vs-41 instead of
    // raw-total-vs-raw-total across different-sized suites.
    val anchor41 = Set(
      "agg_cube", "agg_rollup_counts", "ann_ivf", "ann_lsh", "ann_topk",
      "approx_distinct", "asof_join", "conform_cast", "day_expansion",
      "day_histogram", "dedup_clusters", "dedup_exact", "dedup_latest",
      "dedup_minhash", "dedup_simhash", "embed_neardup", "embed_norm",
      "fingerprint", "fingerprint_pairs", "flatten_props",
      "incremental_window", "join_anti", "join_fk", "join_semi",
      "lang_id", "multimodal_embed", "multimodal_meta", "ngram_jaccard",
      "pivot_events", "q1_agg", "quality_score", "range_join",
      "sample_deterministic", "set_except", "set_intersect",
      "text_stats", "topk_freq", "topk_orders", "union_accumulate",
      "unpivot_events", "window_running")
    val anchorTotal = r3(results
      .filter { case (k, _) => anchor41.contains(k) }
      .flatMap(_._2.minOption).sum)
    // Three lines, detailed first: the driver captures the output TAIL
    // and both the r4 and r5 artifacts lost their totals — r4 because
    // the detailed line led with it, r5 because the compact line's
    // 131-query map alone outgrew the tail budget. The LAST line is
    // therefore minimal (no query map, ~120 bytes) so the total and the
    // like-for-like anchor subset always survive truncation.
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","runs":$repeat,"samples":$samples,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$repeat,"noisy":$noisy,"failed":$failed,"sf":"$sfDir"}""")
    println(s"""{"metric":"total_only","value":$total,"unit":"sec","runs":$repeat,"nq":${results.size},"anchor41":$anchorTotal,"anchor41_nq":${results.count(r => anchor41.contains(r._1))},"failed_n":${results.count(_._2.isEmpty)}}""")
    spark.stop()
  }
}

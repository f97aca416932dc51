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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so the first timed query doesn't absorb JVM
    // startup: touch the aggregate/join/shuffle machinery once.
    try {
      spark.range(0, 2000000).selectExpr("sum(id)", "count(distinct id % 7)")
        .collect()
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.join(w.limit(1), Seq("r_regionkey"), "left_semi").count()
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
    // Two lines, detailed first: the driver captures the output TAIL,
    // so the compact summary (total + best-of-N per query, no samples)
    // is printed LAST and always survives truncation. r04's artifact
    // lost its total because the single detailed line led with it.
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","runs":$repeat,"samples":$samples,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$repeat,"noisy":$noisy,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

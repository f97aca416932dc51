package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Temporary measurement scratch — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SCRATCH_MINPART", "1m"))
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // generic conf overrides for A/B runs: SCRATCH_CONF="k=v;k=v"
    sys.env.get("SCRATCH_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val dir = "/root/testdata/sf0.1"

    val jobStart = scala.collection.mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = (js.time, Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.getOrElse(je.jobId, (je.time, "?"))
        val ms = je.time - t0
        if (ms > sys.env.getOrElse("SCRATCH_JOB_MS", "150").toInt)
          println(f"[scratch]   job ${je.jobId}%3d ${ms}%6d ms  $desc")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        if (ms > 250) println(f"[scratch]     stage ${si.stageId}%3d ${ms}%6d ms tasks=${si.numTasks} cpu=${tm.executorCpuTime/1000000}%dms run=${tm.executorRunTime}%dms gc=${tm.jvmGCTime}%dms ${si.name.take(48)}")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-34s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }

    spark.range(0, 2000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    for (t <- Seq("lineitem","orders","customer","documents","embeddings"))
      spark.read.parquet(s"$dir/$t.parquet").limit(1).count()

    for (q <- args.toSeq; r <- 1 to 2) {
      time(s"$q run$r") {
        spark.sparkContext.setJobDescription(q)
        graft.SparkEntry.queries(q)(spark, dir).count()
      }
    }
    spark.stop()
  }
}

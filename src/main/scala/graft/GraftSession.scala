package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine: the settings every entry
  * point (Verify, Bench, tests, user code) needs, in one place.
  */
object GraftSession {

  /** Local session sized to `cores`, with the testdata-required
    * configuration (UTC, nanos handling) and shuffle parallelism
    * matched to cores (never the 200 default in local mode).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // r14: adaptive partition sizing applies to cached-plan builds
      // too (see Bench.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // SQL fns + broadcast safety net
    Tables.requiredConf.foldLeft(
      b.config("spark.sql.session.timeZone", "UTC")
    ) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
  }
}

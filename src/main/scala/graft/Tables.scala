package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided star-schema parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `$sfDir/`. All queries in [[SparkEntry]] resolve tables through
  * here so scans stay uniform (schema pruning + filter pushdown are
  * then Catalyst's job, not ours).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config required to read the testdata: events.ts is parquet
    * TIMESTAMP(NANOS), which Spark only reads via the nanos-as-long
    * legacy switch; [[apply]] converts it back to a microsecond
    * TimestampType below.
    */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    restoreNanos(raw(spark, sfDir, name))

  /** Read without the nanos→timestamp restoration — for scans that
    * want to push predicates onto the raw nano-epoch long (parquet
    * row-group/page pruning), then convert after filtering
    * (see [[graft.ops.Incremental.windowFilterNanos]]).
    */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Restore TIMESTAMP(NANOS) columns (read as nano-epoch longs under
    * nanosAsLong) to TimestampType with integral division (a
    * double-precision `/` would lose bits on 1.7e18-scale nanos).
    */
  def restoreNanos(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case (d, _) => d
    }
}

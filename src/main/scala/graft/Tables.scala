package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided star-schema parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `$sfDir/`. All queries in [[SparkEntry]] resolve tables through
  * here so scans stay uniform (schema pruning + filter pushdown are
  * then Catalyst's job, not ours).
  *
  * Event-time physical forms seen across testdata vintages:
  *   - parquet TIMESTAMP(MICROS), no timezone → Spark reads
  *     TIMESTAMP_NTZ (current vintage; values are naive UTC and every
  *     graft entry point pins `spark.sql.session.timeZone=UTC`, so an
  *     NTZ→LTZ cast is value-preserving);
  *   - parquet TIMESTAMP(NANOS) → readable only as nano-epoch LONG
  *     under `spark.sql.legacy.parquet.nanosAsLong` (earlier vintage).
  * The [[microsOf]]/[[eventTimeOf]] helpers dispatch on the scanned
  * type so query code is vintage-independent. The engine keeps the
  * scanned column type through filters (predicates push down onto the
  * physical column → row-group/page pruning) and converts only at
  * projection time.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config tolerated by every vintage: nanos-as-long is a
    * no-op on MICROS files but required to read a NANOS `ts`.
    */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    restoreNanos(raw(spark, sfDir, name))

  /** Cheap content fingerprint of a data directory: a mix64 chain over
    * every regular file's (name, size, mtime), path-sorted so listing
    * order can't flip the value. Costs a ~dozen stat calls — cheap
    * enough to recompute on every memo lookup. Used to version-key the
    * train-once caches (BPE merges, classifier weights, codebooks,
    * staged stream dirs): a dir whose parquet is regenerated IN PLACE
    * within one JVM gets a new version and retrains, instead of being
    * served state trained on the old bytes. (A production engine would
    * key on a table-format snapshot id; mtime+size is the
    * content-addressing available to bare parquet dirs.)
    */
  def version(sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(sfDir)
    if (!Files.exists(root)) return "absent"
    val stream = Files.walk(root, 3)
    try {
      val files = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      val it = stream.iterator()
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f)) files += f
      }
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      files.sortBy(_.toString).foreach { f =>
        h = graft.functions.Kernels.mix64(h ^ f.getFileName.toString.##)
        h = graft.functions.Kernels.mix64(h ^ Files.size(f))
        h = graft.functions.Kernels.mix64(h ^ Files.getLastModifiedTime(f).toMillis)
      }
      java.lang.Long.toHexString(h)
    } finally stream.close()
  }

  /** `dir@version` — the memo-cache key form of [[version]]. */
  def versioned(sfDir: String): String = s"$sfDir@${version(sfDir)}"

  /** Read with the physical column types untouched — for scans that
    * filter on the raw event-time form (parquet row-group/page
    * pruning), converting after the filter
    * (see [[graft.ops.Incremental.windowFilterRaw]]).
    */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize a legacy nano-long `ts` back to a timestamp with
    * integral division (a double-precision `/` would lose bits on
    * 1.7e18-scale nanos). Current-vintage TIMESTAMP_NTZ columns pass
    * through unchanged: NTZ is the engine's native event-time type
    * (naive UTC, matching both the parquet data and the DuckDB
    * oracle); APIs that demand TimestampType (watermarks,
    * `unix_micros`) cast at the point of use via [[microsOf]] /
    * [[eventTimeOf]].
    */
  def restoreNanos(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == LongType =>
        d.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case (d, _) => d
    }

  /** Epoch-microsecond BIGINT projection of an event-time column in
    * whatever physical form `df`'s scan produced: legacy nano-long →
    * integral DIV (exact), TIMESTAMP_NTZ → interpreted in the session
    * zone (graft pins UTC), TIMESTAMP → `unix_micros` directly.
    */
  def microsOf(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case LongType => expr(s"$name DIV 1000")
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case _ => unix_micros(col(name))
    }

  /** TimestampType (LTZ) view of an event-time column for APIs that
    * require it — streaming watermarks, `window()`. Value-preserving
    * under the pinned UTC session zone; no-op when already LTZ. The
    * schema overload serves streaming frames, whose schema is fixed
    * up front.
    */
  def eventTimeOf(df: DataFrame, name: String): Column =
    eventTimeOf(df.schema, name)

  def eventTimeOf(schema: org.apache.spark.sql.types.StructType,
                  name: String): Column =
    schema(name).dataType match {
      case LongType => expr(s"timestamp_micros($name DIV 1000)")
      case _ => col(name).cast(TimestampType)
    }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-batched
  * passes.
  *
  * The actual codec work is STUBBED (this container has no
  * image/audio libraries — see the builder contract): `decodeStub`
  * and `embedStub` derive deterministic fake values from the payload
  * bytes. Everything around the stub — the schema, the binary column
  * handling, the mapPartitions batch shape, partition sizing — is the
  * real production plumbing a decoder would drop into.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no
  * driver-side materialization); decode runs per partition so a real
  * decoder amortizes model/codec init across a partition's rows —
  * exactly the shape a Pandas-UDF/`mapInPandas` batch has in PySpark;
  * `maxPartitionBytes` controls decode batch memory, and feature
  * extraction emits fixed-width vectors so downstream similarity ops
  * ([[graft.queries.ScaleQueries]]) apply unchanged.
  */
object Multimodal {

  /** Media record: payload + the metadata a decoder would fill. */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, mean_val: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Wrap any table with an id and a string column into a media table
    * (the string bytes stand in for an encoded image/audio payload).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast(BinaryType).as("payload"))

  /** REAL container-header metadata: format/width/height/bit-depth
    * parsed from the payload's PNG IHDR / JPEG SOFn / BMP
    * BITMAPINFOHEADER / GIF screen-descriptor bytes in the scan stage
    * (codegen'd [[graft.functions.MediaHeaderExpr]] — dimensions live
    * in container headers, so no codec is needed for them; only
    * pixel-level statistics still require the stubbed decoder below).
    * Unrecognized payloads → format_code 0, dims 0.
    */
  def headerMeta(media: DataFrame): DataFrame = {
    import graft.functions.dsl._
    media.select(col("media_id"), col("kind"),
        coalesce(length(col("payload")), lit(0)).cast(LongType).as("n_bytes"),
        media_header(col("payload")).as("__h"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        try_element_at(col("__h"), lit(1)).as("format_code"),
        try_element_at(col("__h"), lit(2)).as("width"),
        try_element_at(col("__h"), lit(3)).as("height"),
        try_element_at(col("__h"), lit(4)).as("bit_depth"))
  }

  /** STUB decode — deterministic fake dimensions/statistics derived
    * from payload size (`???`-equivalent for the codec call, which
    * would be e.g. ImageIO/ffmpeg here). Runs as a per-partition
    * iterator pass so a real decoder initializes once per partition.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open(...)  — once per partition
        it.map { case (id, kind, payload) =>
          val n = if (payload == null) 0L else payload.length.toLong
          // STUB: fake decode — metadata as pure functions of size
          MediaMeta(id, kind, n,
            width = (64 + n % 256).toInt,
            height = (64 + (n * 7) % 256).toInt,
            mean_val = (n % 1000).toDouble / 1000.0)
        }
      }
  }

  /** STUB feature extraction: fixed-width float vector per payload,
    * seeded from payload bytes (a real model would run here, batched
    * per partition). Output matches the `embeddings` table shape so
    * ANN/similarity operators compose directly.
    */
  def embedStub(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val seed = if (payload == null) 0L
            else payload.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
          val v = Array.tabulate(dim) { i =>
            val x = graft.functions.Kernels.mix64(seed + i)
            (x.toDouble / Long.MaxValue).toFloat
          }
          (id, v)
        }
      }.toDF("media_id", "embedding")
  }

  /** Frame-sampling plan for video payloads: every `stride`-th frame
    * index up to `nFrames` — the Spark-side plumbing (explode into
    * per-frame rows) around a stubbed frame decoder.
    */
  def frameSamplePlan(media: DataFrame, nFrames: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), lit(nFrames - 1), lit(stride)))
          .as("frame_idx"))
}

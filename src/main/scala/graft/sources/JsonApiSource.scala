package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for JSON:API page envelopes — the
  * reference's paginated REST scan (S1-S4, outreach_etl.py:73-109,
  * 130-213) re-expressed as a Spark source. Instead of a driver-side
  * accumulate loop, each fetched page (a JSON file with the
  * `{data, meta, links}` envelope the reference consumes at
  * outreach_etl.py:102-136) becomes one [[InputPartition]], so pages
  * scan in parallel across executors — the reference's per-day chunk
  * split (outreach_etl.py:157-166) is exactly this partitioning.
  *
  * Pushdown surface (mirrors what the reference pushes into the API
  * query string at outreach_etl.py:115-117):
  *  - filters on `attributes_updatedAt` (the `filter[updatedAt]=lo..hi`
  *    range) and on any flat string/long column, evaluated inside the
  *    reader — rows never reach Spark;
  *  - required-column pruning (only requested columns are converted);
  *  - limit pushdown (reader stops parsing early).
  *
  * Records are flattened with the reference's underscore convention
  * (flatten_json, etl_tools.py:177-193) against the declared schema
  * from [[graft.schema.SchemaRegistry]] — list elements positionally
  * (`a_0`), nested dicts by path (`a_b`).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.JsonApiSource")
  *     .option("path", pagesDir).option("resource", "prospects").load()
  * }}}
  */
class JsonApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonApiSource.tableSchema(options.get("resource"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JsonApiTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object JsonApiSource {
  /** Declared flat schema minus the reference's ingest drops
    * (outreach_etl.py:105-107).
    */
  def tableSchema(resource: String): StructType = {
    require(resource != null, "option 'resource' is required")
    val full = graft.schema.SchemaRegistry.schemaFor(resource)
    val drops = graft.schema.SchemaRegistry.ingestDrops(resource).toSet
    StructType(full.fields.filterNot(f => drops(f.name)))
  }
}

class JsonApiTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"jsonapi($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonApiScanBuilder(tableSchema,
      Option(options.get("path")).getOrElse(path))
}

class JsonApiScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition(JsonApiFilters.supported)
    pushed = supported
    rest // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def build(): Scan =
    new JsonApiScan(path, fullSchema, required, pushed, limit)
}

class JsonApiScan(path: String, fullSchema: StructType,
                  required: StructType, filters: Array[Filter], limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"jsonapi path=$path pushed=${filters.mkString(",")} limit=$limit"

  /** One partition per page file — pages scan in parallel, the way the
    * reference's per-day/page loop is sequential (SURVEY.md §3.3).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
      .sortBy(_.getName)
    files.map(f => JsonApiInputPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonApiReaderFactory(fullSchema, required, filters, limit)
}

case class JsonApiInputPartition(file: String) extends InputPartition

class JsonApiReaderFactory(fullSchema: StructType, required: StructType,
                           filters: Array[Filter], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonApiPartitionReader(
      p.asInstanceOf[JsonApiInputPartition].file,
      fullSchema, required, filters, limit)
}

/** Parses one page envelope, flattens `data[]` records, applies pushed
  * filters, converts only required columns to Catalyst values.
  */
class JsonApiPartitionReader(file: String, fullSchema: StructType,
                             required: StructType, filters: Array[Filter],
                             limit: Int)
    extends PartitionReader[InternalRow] {

  private val records: Iterator[Map[String, JsonNode]] = {
    val root = new ObjectMapper().readTree(new java.io.File(file))
    val data = root.path("data")
    if (data.isArray) data.elements().asScala.map(JsonApiFlatten.flatten)
    else Iterator.empty
  }

  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    while (emitted < limit && records.hasNext) {
      val rec = records.next()
      if (filters.forall(f => JsonApiFilters.eval(f, rec, fullSchema))) {
        current = toRow(rec)
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def toRow(rec: Map[String, JsonNode]): InternalRow = {
    val values = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      values(i) = rec.get(f.name).map(JsonApiFlatten.convert(_, f.dataType)).orNull
      i += 1
    }
    new GenericInternalRow(values)
  }
}

/** The reference's flatten_json (etl_tools.py:177-193) over Jackson
  * nodes: dicts by `_`-joined path, list elements positionally.
  */
object JsonApiFlatten {
  def flatten(node: JsonNode): Map[String, JsonNode] = {
    val out = mutable.LinkedHashMap.empty[String, JsonNode]
    def walk(n: JsonNode, prefix: String): Unit =
      if (n.isObject) {
        n.properties().asScala.foreach { e =>
          walk(e.getValue,
            if (prefix.isEmpty) e.getKey else s"${prefix}_${e.getKey}")
        }
      } else if (n.isArray) {
        var i = 0
        n.elements().asScala.foreach { el =>
          walk(el, s"${prefix}_$i"); i += 1
        }
      } else if (!n.isNull && !n.isMissingNode) {
        out(prefix) = n
      }
    walk(node, "")
    out.toMap
  }

  /** JSON scalar → Catalyst value for the declared type (the late
    * dtype coercion pass, etl_tools.py:45-61: bad values raise — we
    * throw too, matching errors='raise').
    */
  def convert(n: JsonNode, dt: DataType): Any = dt match {
    case StringType =>
      UTF8String.fromString(if (n.isTextual) n.asText() else n.toString)
    case LongType    => if (n.isNumber) n.asLong() else n.asText().trim.toLong
    case DoubleType  => if (n.isNumber) n.asDouble() else n.asText().trim.toDouble
    case BooleanType => if (n.isBoolean) n.asBoolean() else n.asText().trim.toBoolean
    case TimestampType => parseTimestampMicros(n.asText())
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** ISO-8601 (with or without offset / time part) → epoch micros. */
  def parseTimestampMicros(s: String): Long = {
    val inst =
      try Instant.parse(s)
      catch {
        case _: java.time.format.DateTimeParseException =>
          try LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
          catch {
            case _: java.time.format.DateTimeParseException =>
              LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant
          }
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }
}

/** Pushed-filter evaluation inside the reader — the JSON:API
  * server-side `filter[...]` semantics (outreach_etl.py:115-117).
  */
object JsonApiFilters {
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull => true
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  def eval(f: Filter, rec: Map[String, JsonNode], schema: StructType): Boolean =
    f match {
      case EqualTo(a, v)            => cmp(a, v, rec, schema).contains(0)
      case GreaterThan(a, v)        => cmp(a, v, rec, schema).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v, rec, schema).exists(_ >= 0)
      case LessThan(a, v)           => cmp(a, v, rec, schema).exists(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v, rec, schema).exists(_ <= 0)
      case IsNull(a)                => !rec.contains(a)
      case IsNotNull(a)             => rec.contains(a)
      case And(l, r)                => eval(l, rec, schema) && eval(r, rec, schema)
      case _                        => true
    }

  /** Compare record value vs literal in the declared type's order;
    * None when the column is absent (filter fails, except IsNull).
    */
  private def cmp(attr: String, value: Any, rec: Map[String, JsonNode],
                  schema: StructType): Option[Int] =
    rec.get(attr).map { n =>
      schema.fields.find(_.name == attr).map(_.dataType) match {
        case Some(TimestampType) =>
          val lv = value match {
            case t: java.sql.Timestamp =>
              val ti = t.toInstant
              ti.getEpochSecond * 1000000L + ti.getNano / 1000L
            case i: Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
            case s => JsonApiFlatten.parseTimestampMicros(s.toString)
          }
          java.lang.Long.compare(
            JsonApiFlatten.parseTimestampMicros(n.asText()), lv)
        case Some(LongType) =>
          java.lang.Long.compare(n.asLong(), value.toString.toLong)
        case Some(DoubleType) =>
          java.lang.Double.compare(n.asDouble(), value.toString.toDouble)
        case _ =>
          // binary UTF-8 order, matching Spark's UTF8String collation
          // (Java String.compareTo is UTF-16 code-unit order and
          // disagrees beyond the BMP)
          org.apache.spark.unsafe.types.UTF8String.fromString(n.asText())
            .compareTo(
              org.apache.spark.unsafe.types.UTF8String.fromString(value.toString))
      }
    }
}

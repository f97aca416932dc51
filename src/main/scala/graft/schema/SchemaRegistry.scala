package graft.schema

import scala.io.Source
import scala.util.Using

import org.apache.spark.sql.types._

/** Declared per-resource schemas — the reference's `schemas/` JSON files
  * contract (reference: etl_tools.py:37-61; format per
  * schemas/prospects.json:2-4, a Singer-style `["null", T]` union per
  * flattened column; SURVEY.md §1.3-1.4).
  *
  * Resource files under `graft/schemas/` (one JSON per resource) are compact
  * `{column: type}` maps covering the same 207/90/68 columns. Every
  * column is nullable (the reference's union type always admits null).
  */
object SchemaRegistry {

  /** Supported resources (reference: outreach_etl.py:233-235).
    * `accounts`/`opportunities` are routable in the reference's URL
    * dispatch but have no schema files — they are the documented
    * extension point, not supported resources (SURVEY.md §1.1).
    */
  val Resources: Seq[String] = Seq("prospects", "sequences", "mailings")

  /** Reference scalar type → Spark type (SURVEY.md §1.3). */
  def sparkType(t: String): DataType = t match {
    case "string"   => StringType
    case "boolean"  => BooleanType
    case "integer"  => LongType
    case "float"    => DoubleType
    case "datetime" => TimestampType
    case other => throw new IllegalArgumentException(
      s"unknown schema type '$other'")
  }

  /** Minimal JSON object parser for the flat {"name": "type"} resource
    * files (no external JSON dependency needed for config files).
    */
  private def parseFlatJson(s: String): Seq[(String, String)] = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    pair.findAllMatchIn(s).map(m => (m.group(1), m.group(2))).toSeq
  }

  private val cache = scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** Resources the reference's URL dispatch routes but ships no schema
    * for — requesting one would crash the reference mid-sync
    * (create_dF_from_schema can't find schemas/accounts.json); here
    * the dispatch fails eagerly with an actionable message instead.
    */
  val ExtensionResources: Set[String] = Set("accounts", "opportunities")

  /** Declared StructType for a resource; columns in file (sorted)
    * order, all nullable.
    */
  def schemaFor(resource: String): StructType =
    cache.getOrElseUpdate(resource, {
      if (ExtensionResources(resource))
        throw new IllegalArgumentException(
          s"resource '$resource' is a declared extension point: the " +
            s"reference routes it (outreach_etl.py:81-84) but ships no " +
            s"schema file; add graft/schemas/$resource.json to enable it")
      val path = s"/graft/schemas/$resource.json"
      val in = getClass.getResourceAsStream(path)
      require(in != null,
        s"unknown resource '$resource' (no schema at $path); " +
          s"supported: ${Resources.mkString(", ")}")
      val text = Using.resource(Source.fromInputStream(in, "UTF-8"))(_.mkString)
      StructType(parseFlatJson(text).map { case (name, t) =>
        StructField(name, sparkType(t), nullable = true)
      })
    })

  /** The column subset dropped at ingest for a resource
    * (reference: outreach_etl.py:105-107 pops the two fat mailing
    * body columns before materialization).
    */
  def ingestDrops(resource: String): Seq[String] = resource match {
    case "mailings" => Seq("attributes_bodyHtml", "attributes_bodyText")
    case _          => Seq.empty
  }
}

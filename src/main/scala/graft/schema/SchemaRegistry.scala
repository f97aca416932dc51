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
    * the dispatch fails eagerly with an actionable message instead,
    * and BOTH extension mechanisms below can enable them without a
    * rebuild.
    */
  val ExtensionResources: Set[String] = Set("accounts", "opportunities")

  /** System property naming a directory of extra `{resource}.json`
    * schema files — the config-driven extension point. Files there
    * win over the packaged classpath schemas, so a deployment can
    * both ADD resources (accounts.json) and OVERRIDE shipped ones.
    */
  val SchemasDirProp: String = "graft.schemas.dir"

  /** Programmatic twin of [[SchemasDirProp]]: register (or replace) a
    * resource schema at runtime. Later [[schemaFor]] calls return it.
    */
  def register(resource: String, schema: StructType): Unit =
    cache.put(resource, schema)

  /** Register from the same compact `{"column": "type"}` JSON the
    * schema files use.
    */
  def registerJson(resource: String, json: String): Unit =
    register(resource, structFromFlatJson(json))

  private def structFromFlatJson(text: String): StructType =
    StructType(parseFlatJson(text).map { case (name, t) =>
      StructField(name, sparkType(t), nullable = true)
    })

  private def externalSchema(resource: String): Option[StructType] =
    sys.props.get(SchemasDirProp)
      .map(d => java.nio.file.Paths.get(d, s"$resource.json"))
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => structFromFlatJson(java.nio.file.Files.readString(p)))

  /** Declared StructType for a resource; columns in file (sorted)
    * order, all nullable. Resolution order: runtime-registered →
    * `-Dgraft.schemas.dir` file → packaged classpath file. Unknown
    * resources fail eagerly with an actionable message (never a raw
    * file-not-found mid-sync, which is how the reference dies at
    * etl_tools.py:39).
    */
  def schemaFor(resource: String): StructType =
    cache.getOrElseUpdate(resource, {
      externalSchema(resource).getOrElse {
        if (ExtensionResources(resource))
          throw new IllegalArgumentException(
            s"resource '$resource' is a declared extension point: the " +
              s"reference routes it (outreach_etl.py:81-84) but ships no " +
              s"schema file; register one via SchemaRegistry.register/" +
              s"registerJson, or drop $resource.json in -D$SchemasDirProp")
        val path = s"/graft/schemas/$resource.json"
        val in = getClass.getResourceAsStream(path)
        require(in != null,
          s"unknown resource '$resource' (no schema at $path, none " +
            s"registered, none in -D$SchemasDirProp); " +
            s"supported: ${Resources.mkString(", ")}")
        val text = Using.resource(Source.fromInputStream(in, "UTF-8"))(_.mkString)
        structFromFlatJson(text)
      }
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

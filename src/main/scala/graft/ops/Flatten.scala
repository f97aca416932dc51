package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive JSON/struct flatten — the reference's core data-model move
  * (reference: flatten_json, etl_tools.py:177-193):
  *   - struct field `a.b`        → column `a_b`
  *   - array element `a[i]`      → positional column `a_i` (schema-capped)
  *   - nested array `a[i][j]`    → `a_i_j` (the contactHistogram shape,
  *     reference: schemas/prospects.json:44-115)
  *
  * Implemented as a *schema-driven projection builder*: we walk the
  * Spark schema and emit one `Column` per flattened leaf. No UDF, no
  * custom Expression — the whole flatten compiles into a single
  * whole-stage-codegen projection over the scan, and nested-schema
  * pruning still reaches the parquet/JSON reader because every leaf is
  * a plain dot-path/element_at expression.
  *
  * Scale note: flatten is narrow (no shuffle). At 100 TB the only cost
  * is the projection itself; column pruning means unreferenced nested
  * fields are never materialized.
  */
object Flatten {

  /** Default cap for positional array expansion when the declared
    * schema doesn't bound the arity (the reference caps by whatever
    * indices the hand-written schema declares, e.g. 16 for
    * relationships_sequenceSteps — schemas/sequences.json:159-254).
    */
  val DefaultArrayArity = 4

  /** Build the flattened projection list for `schema`.
    * `arity(path)` bounds positional expansion per array column path
    * (underscore-joined), falling back to `defaultArity`.
    */
  def projection(schema: StructType,
                 defaultArity: Int = DefaultArrayArity,
                 arity: Map[String, Int] = Map.empty): Seq[Column] = {

    def expand(c: Column, name: String, dt: DataType): Seq[(String, Column)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f =>
            expand(c.getField(f.name), s"${name}_${f.name}", f.dataType))
        case at: ArrayType =>
          val n = arity.getOrElse(name, defaultArity)
          (0 until n).flatMap(i =>
            // try_element_at is 1-based; out-of-range yields NULL (even
            // under ANSI mode), matching the reference's absent-column →
            // NaN union semantics.
            expand(try_element_at(c, lit(i + 1)), s"${name}_$i", at.elementType))
        case mt: MapType =>
          // Maps keep dynamic keys; reference JSON never produces maps
          // (dicts become structs), so pass through as-is.
          Seq(name -> c)
        case _ => Seq(name -> c)
      }

    schema.fields.toSeq.flatMap(f =>
      expand(col(f.name), f.name, f.dataType).map { case (n, cc) => cc.as(n) })
  }

  /** Flatten every nested column of `df` into underscore-named flat
    * columns (reference: applied per row at outreach_etl.py:103, then
    * normalized at :104 — here it is one declarative projection).
    */
  def flatten(df: DataFrame,
              defaultArity: Int = DefaultArrayArity,
              arity: Map[String, Int] = Map.empty): DataFrame =
    df.select(projection(df.schema, defaultArity, arity): _*)

  /** Parse a JSON-string column with `schema` and flatten it in place;
    * other columns are kept. This is the ingest path for dynamic JSON
    * payloads (e.g. the `props` column of the events table).
    */
  def flattenJsonColumn(df: DataFrame, jsonCol: String,
                        schema: DataType,
                        defaultArity: Int = DefaultArrayArity): DataFrame = {
    val parsed = df.withColumn(jsonCol, from_json(col(jsonCol), schema))
    val keep = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    val flat = projection(StructType(Seq(StructField(jsonCol, schema))),
      defaultArity)
    parsed.select(keep ++ flat: _*)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaRegistry

class SourceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/jsonapi/$name").getPath

  private def read(dir: String): DataFrame =
    spark.read.format("graft.sources.JsonApiSource")
      .option("resource", "prospects")
      .option("path", dir)
      .load()

  test("schema registry: declared column counts and types") {
    assert(SchemaRegistry.schemaFor("prospects").length == 207)
    assert(SchemaRegistry.schemaFor("sequences").length == 90)
    assert(SchemaRegistry.schemaFor("mailings").length == 68)
    val p = SchemaRegistry.schemaFor("prospects")
    assert(p("attributes_updatedAt").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(p("attributes_clickCount").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(p.fields.forall(_.nullable))
  }

  test("jsonapi source: pages scan in parallel partitions, flatten applied") {
    val df = read(fixture("prospects"))
    assert(df.rdd.getNumPartitions == 2) // one per page file
    val rows = df.select("id", "attributes_firstName", "attributes_emails_1",
        "attributes_contactHistogram_0_1", "relationships_account_data_id")
      .orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "Ada")
    assert(rows(0).getString(2) == "b@x.com")
    assert(rows(0).getString(3) == "2")
    assert(rows(0).getLong(4) == 7L)
    // absent fields ride as NULL (schema-seeded columns)
    assert(rows(1).isNullAt(2))
  }

  test("jsonapi source: updatedAt range filter is pushed and applied") {
    val df = read(fixture("prospects"))
      .filter(col("attributes_updatedAt")
        .between(lit("2019-06-01"), lit("2019-06-05")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("jsonapi"), plan)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("jsonapi source: limit pushdown stops the reader early") {
    val df = read(fixture("prospects")).limit(1)
    assert(df.count() == 1)
  }

  test("jsonapi source: column pruning reaches the reader") {
    val df = read(fixture("prospects")).select("attributes_firstName")
    assert(df.schema.length == 1)
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("Ada", "Grace", "Edsger"))
  }

  test("jsonapi source: empty page (meta.count=0) yields empty relation") {
    assert(read(fixture("empty")).count() == 0)
  }

  test("mailings table schema excludes the ingest-dropped body columns") {
    val s = graft.sources.JsonApiSource.tableSchema("mailings")
    assert(s.length == 66)
    assert(!s.fieldNames.contains("attributes_bodyHtml"))
    assert(!s.fieldNames.contains("attributes_bodyText"))
  }
}

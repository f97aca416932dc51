package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Hints

class HintsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("maybeBroadcast gates the hint on the size estimate") {
    val small = spark.range(0, 10).toDF("id")
    // under the bound: hint applied → broadcast join plan
    val hinted = spark.range(0, 100).toDF("k")
      .join(Hints.maybeBroadcast(small.withColumnRenamed("id", "k")), "k")
    assert(hinted.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // over the bound (maxBytes=0): no hint → planner's own choice
    val unhinted = Hints.maybeBroadcast(small, maxBytes = 0)
    assert(unhinted eq small) // returned unwrapped
  }

  test("chunkedBroadcastThetaJoin: chunked plan, identical result") {
    val corpus = spark.range(0, 200).toDF("cid")
    val queries = spark.range(0, 50).toDF("qid")
    val cond = col("qid") =!= col("cid")
    val plain = corpus.join(broadcast(queries), cond)
      .groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // force ~4 bounded chunks
    val bound = (Hints.estimatedBytes(queries) / 4 + 1).toLong
    val chunked = Hints.chunkedBroadcastThetaJoin(
        corpus, queries, chunkKey = col("qid"), cond = cond,
        maxBytes = bound)
      .groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chunked == plain,
      "hash-chunked broadcast joins must partition, not change, the cross product")

    // the chunked plan is a union of >1 bounded joins
    val plan = Hints.chunkedBroadcastThetaJoin(corpus, queries,
      col("qid"), cond, maxBytes = bound).queryExecution.logical.toString
    assert(plan.contains("Union"), plan)
  }
}

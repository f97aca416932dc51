package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the training-data-prep query family
  * (lm_surprisal, pack_sequences, filter_funnel, dedup_canonical);
  * value-level correctness is pinned by the DuckDB oracles.
  */
class TrainingPrepSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pack_sequences: exact prefix-sum and bin assignment") {
    val rows = queries.TextQueries.packSequences(spark, sf)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("seq_start") == 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("seq_start") ==
        a.getAs[Long]("seq_start") + a.getAs[Long]("n_tokens"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("bin_id") == r.getAs[Long]("seq_start") / 2048L)
    }
  }

  test("lm_surprisal: scores positive, capped, common text scores low") {
    val rows = queries.TextQueries.lmSurprisal(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sc = r.getAs[Long]("surprisal_e6")
      assert(sc > 0L && sc <= 1000000000000L)
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
  }

  test("filter_funnel: stages nest monotonically from the total") {
    val rows = queries.TextQueries.filterFunnel(spark, sf)
      .orderBy("stage_idx").collect()
    assert(rows.length == 4)
    val total = Tables(spark, sf, "documents").count()
    assert(rows.head.getAs[Long]("n_kept") == total)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_kept") <= a.getAs[Long]("n_kept"))
    }
  }

  test("line_dedup: first doc intact, kept lines = distinct lines") {
    import graft.functions.dsl._
    val docs = Tables(spark, sf, "documents")
    val out = queries.TextQueries.lineDedup(spark, sf)
      .orderBy("doc_id").collect()
    // the lowest doc_id sees each of its DISTINCT lines first; expected
    // reassembly drops only its own internal repeats
    val firstToks = docs.orderBy("doc_id").select("text")
      .head().getString(0).split("\\s+").filter(_.nonEmpty)
    val firstLines = firstToks.grouped(10).map(_.mkString(" ")).toSeq
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    firstLines.foreach(seen += _)
    assert(out.head.getAs[String]("clean_text") == seen.mkString(" "))
    val distinctLines = docs
      .select(explode(chunk_tokens(col("text"), 10, 10)).as("line"))
      .distinct().count()
    assert(out.map(_.getAs[Long]("n_lines_kept")).sum == distinctLines)
  }

  test("dedup_canonical: keeps exactly cluster minima plus singletons") {
    // r13 rebase: the shipping query rides the maintained LSH labels
    // (word-3-shingle Jaccard >= 0.7 — the dedup_clusters family), so
    // the expectation recomputes THAT closure from the operator layer;
    // Round13Spec additionally pins it against a brute driver-side
    // closure, and the DuckDB oracle replays it from raw text
    val docs = Tables(spark, sf, "documents")
    val labels = ops.Dedup.connectedComponents(
      ops.Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 8, threshold = 0.7)
        .select(col("id_a"), col("id_b")))
    val surv = queries.ScaleQueries.dedupCanonical(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val members = labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    members.foreach { case (id, cid) =>
      if (id == cid) assert(surv.contains(id), s"canonical $id dropped")
      else assert(!surv.contains(id), s"duplicate $id kept")
    }
    val inClusters = members.map(_._1).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    (all -- inClusters).foreach(id => assert(surv.contains(id)))
  }

  test("mixture_sample: exact per-source quotas, deterministic picks") {
    val docs = Tables(spark, sf, "documents")
    val nTotal = docs.count()
    val got = queries.TextQueries.mixtureSample(spark, sf).collect()
    // per-source count is exactly budget * w / 50
    val bySource = got.groupBy(_.getString(1)).view.mapValues(_.length)
    bySource.foreach { case (src, n) =>
      val w = src.drop(3).toInt % 4 + 1
      assert(n == nTotal * 2 / 5 * w / 50, s"$src quota")
    }
    // deterministic: a second run picks the identical ids
    val again = queries.TextQueries.mixtureSample(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }
}

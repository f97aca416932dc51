package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: k-anonymity lattice, median/MAD outliers, PMI
  * collocations, token-budget mixing, and the stream-maintained
  * top-k. Each test states the operator's INVARIANT (or brute-forces
  * the small corpus independently), not a copied expected value.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("k_anonymity: generalization never increases risky rows; " +
      "totals reconcile") {
    val rows = queries.AdvancedQueries.kAnonymity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l0Risky = r.getAs[Long]("l0_risky_rows")
      val l1Risky = r.getAs[Long]("l1_risky_rows")
      // an l1 group is a union of l0 groups: any union containing a
      // size>=k subgroup is itself >=k, so risky rows only shrink
      assert(l1Risky <= l0Risky,
        s"nation ${r.get(0)}: generalized risky $l1Risky > full $l0Risky")
      assert(r.getAs[Long]("l0_risky_groups") <= r.getAs[Long]("l0_groups"))
      assert(r.getAs[Long]("l0_risky_rows") <= r.getAs[Long]("n_rows"))
    }
    val total = Tables(spark, dir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
  }

  test("mad_outliers matches a brute-force median/MAD per type") {
    val got = queries.AdvancedQueries.madOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val raw = Tables(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    def lowerMedian(sorted: Seq[Long]): Long =
      sorted((sorted.size + 1) / 2 - 1)
    assert(got.keySet == raw.keySet)
    raw.foreach { case (et, vs) =>
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = lowerMedian(devs)
      val nOut = devs.count(_ > 3 * mad).toLong
      assert(got(et) == ((vs.size.toLong, med, mad, nOut)),
        s"$et: got ${got(et)}, brute ($med, $mad, $nOut)")
    }
  }

  test("pmi_bigrams matches a brute-force lift ranking") {
    val docs = Tables(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val tokss = docs.map(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
    val uni = tokss.flatten.groupBy(identity).map { case (w, a) =>
      w -> a.length.toLong }
    val bgs = tokss.flatMap(ts => ts.dropRight(1).zip(ts.drop(1)))
      .groupBy(identity).map { case (p, a) => p -> a.length.toLong }
      .filter(_._2 >= 5)
    val nB = tokss.map(ts => math.max(ts.length - 1, 0).toLong).sum
    val expected = bgs.map { case ((x, y), cxy) =>
      (x, y, cxy, uni(x), uni(y), cxy * nB * 1000000L / (uni(x) * uni(y)))
    }.toSeq.sortBy { case (x, y, _, _, _, l) => (-l, x, y) }.take(20)
    val got = queries.TextQueries.pmiBigrams(spark, dir).collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"),
        r.getAs[Long]("c_y"), r.getAs[Long]("lift_e6"))).toSeq
    assert(got == expected)
  }

  test("token_budget_mix: fill is within budget and MAXIMAL in the " +
      "hash order (the next draw would overflow)") {
    import graft.functions.Kernels.mix64
    val rows = queries.TextQueries.tokenBudgetMix(spark, dir).collect()
    assert(rows.nonEmpty)
    val perDoc = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map { r =>
        val ntok = r.getString(2).toLowerCase.split("\\W+")
          .count(_.nonEmpty).toLong
        (r.getString(0), mix64(r.getLong(1) ^ mix64(911L)), r.getLong(1),
          ntok)
      }.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val budget = r.getAs[Long]("budget_tokens")
      val sel = r.getAs[Long]("sel_tokens")
      val nDocs = r.getAs[Long]("n_docs")
      assert(sel <= budget)
      assert(r.getAs[Long]("fill_e6") <= 1000000L)
      // replay the greedy prefix independently
      val order = perDoc(src).sortBy(d => (d._2, d._3)).map(_._4)
      val prefix = order.scanLeft(0L)(_ + _).drop(1)
      val expectN = prefix.takeWhile(_ <= budget).length
      assert(nDocs == expectN, s"$src: selected $nDocs, greedy $expectN")
      if (expectN < order.length)
        assert(sel + order(expectN) > budget,
          s"$src: not maximal — next doc still fits")
    }
  }

  test("ann_recall_curve: monotone nondecreasing in nprobe, within " +
      "bounds, and useful at the max probe budget") {
    val rows = queries.ScaleQueries.annRecallCurve(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getAs[Long]("recall_e6")).toSeq
    // candidate sets nest, and a candidate that displaces an exact
    // hit from the approx top-3 outranks it under the SAME
    // (sim_r DESC, cid) order the exact ranking uses — so the
    // displacer is itself an exact-top-3 hit and the hit count never
    // falls: the curve is monotone by construction
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"curve decreased: $recalls")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("recall_e6") <= 1000000L)
    }
    assert(recalls.last >= 600000L,
      s"recall@3 at nprobe=8 below the 60% family floor: ${recalls.last}")
  }

  test("dedup_impact: reconciles with dedup_canonical and never " +
      "keeps more than it saw") {
    val rows = queries.ScaleQueries.dedupImpact(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("kept_e6") <= 1000000L)
    }
    val keptTotal = rows.map(_.getAs[Long]("kept_docs")).sum
    val canonical = queries.ScaleQueries.dedupCanonical(spark, dir).count()
    assert(keptTotal == canonical,
      s"impact keeps $keptTotal docs, canonical corpus has $canonical")
    val beforeTotal = rows.map(_.getAs[Long]("n_docs")).sum
    assert(beforeTotal == Tables(spark, dir, "documents").count())
  }

  test("quality_token_curve: cumulative curve closes on the corpus " +
      "token total and decreases with the threshold") {
    val rows = queries.TextQueries.qualityTokenCurve(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    // lowest bucket row carries the whole corpus at-or-above it
    assert(rows.head.getAs[Long]("cum_tokens_ge") == total)
    assert(rows.head.getAs[Long]("share_ge_e6") == 1000000L)
    // raising the threshold never increases surviving mass
    rows.map(_.getAs[Long]("cum_tokens_ge")).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
    // highest bucket's cumulative is exactly its own mass
    assert(rows.last.getAs[Long]("cum_tokens_ge") ==
      rows.last.getAs[Long]("n_tokens"))
  }

  test("ri_audit: every FK edge is orphan-free and child counts " +
      "match the tables") {
    val rows = queries.AdvancedQueries.riAudit(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L, s"${r.getString(0)}")
      assert(r.getAs[Int]("ok") == 1)
    }
    val byRel = rows.map(r => r.getString(0) -> r.getAs[Long]("n_child"))
      .toMap
    assert(byRel("orders.o_custkey->customer") ==
      Tables(spark, dir, "orders").count())
    assert(byRel("lineitem.l_orderkey->orders") ==
      Tables(spark, dir, "lineitem").count())
  }

  test("cc_delta_lsh: LSH-sourced maintenance lands on the full " +
      "rebuild's labels") {
    val maintained = queries.ScaleQueries.ccDeltaLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rebuild = queries.ScaleQueries.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(maintained == rebuild)
  }

  test("stream_topk (merged across >=2 batches) equals the batch " +
      "recompute") {
    val got = queries.AdvancedQueries.streamTopk(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id"))
    val batch = Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), col("rnk"), col("user_id"), col("n"))
      .orderBy(col("event_type"), col("rnk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == batch.toSeq)
  }
}

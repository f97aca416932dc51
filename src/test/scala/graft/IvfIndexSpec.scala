package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** [[graft.ops.Similarity.ivfIndexAppendDelta]] — the storage-layer
  * properties the driver query (`ann_ivf_delta`, set-equality of
  * served search results) cannot see: untouched lists' FILES are not
  * rewritten (the compaction is local to delta lists), and the merged
  * index CONTENT equals a rebuild row for row.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // four well-separated axis clusters in 4-d so assignment is stable
  private def vec(axis: Int, eps: Float): Seq[Float] = {
    val v = Array.fill(4)(eps)
    v(axis) = 1f
    v.toSeq
  }

  private def emb(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, vec((i % 4).toInt, 0.01f * (i % 3))))
      .toDF("vec_id", "embedding")
  }

  test("append+compact: merged content equals rebuild; untouched " +
      "lists' files are not rewritten; appended vectors are served") {
    val base = Files.createTempDirectory("ivf_base").toString
    val full = Files.createTempDirectory("ivf_full").toString
    val all = (0L until 40L)
    // codebook: one representative per axis cluster
    val codebook = Array(0L, 1L, 2L, 3L)
      .map(i => (i, vec((i % 4).toInt, 0.01f * (i % 3))))
    // delta = the ids ≡ 1 mod 4 → ONLY list 1 is touched
    val deltaIds = all.filter(_ % 4 == 1)
    Similarity.ivfIndexWriteWithCodebook(
      emb(all.filterNot(_ % 4 == 1)), "vec_id", "embedding", base, codebook)
    Similarity.ivfIndexWriteWithCodebook(
      emb(all), "vec_id", "embedding", full, codebook)
    def files(dir: String): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val before = files(base)
    Similarity.ivfIndexAppendDelta(spark, base, codebook,
      emb(deltaIds), "vec_id", "embedding")
    val after = files(base)
    // untouched lists: identical file sets (not rewritten)
    for ((part, fs) <- before if part != "centroid_id=1")
      assert(after(part) == fs,
        s"untouched list $part was rewritten: $fs -> ${after(part)}")
    // touched list: compacted to a fresh file set
    assert(after("centroid_id=1") != before.getOrElse("centroid_id=1",
      Set.empty[String]), "delta list must have been rewritten")
    // content equality vs rebuild
    // partition-dir type inference reads centroid_id back as INT —
    // normalize to long for the comparison
    def content(dir: String) = spark.read.parquet(dir)
      .select(col("cid"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(content(base) == content(full),
      "maintained index content must equal the rebuild")
    // a freshly appended vector is served by the maintained index
    val got = Similarity.ivfIndexedSearch(spark, base, codebook,
        qid = -1L, qv = vec(1, 0f), nprobe = 1, k = 3)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    assert(got.exists(_ % 4 == 1) && got.subsetOf(all.toSet),
      s"expected list-1 members (incl. appended), got $got")
    // an EMPTY delta is a byte-level no-op — no list rewritten
    val preEmpty = files(base)
    Similarity.ivfIndexAppendDelta(spark, base, codebook,
      emb(Seq.empty), "vec_id", "embedding")
    assert(files(base) == preEmpty,
      "empty delta must not rewrite any list")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string self-join at edit distance ≤ 1 via the FastSS
  * deletion neighborhood (Bocek et al., U. Zurich TR 2007): two
  * strings within one edit share at least one member of their
  * {self} ∪ {one-char deletions} variant sets, so candidate pairs fall
  * out of an EQUI-join on the variant — never a quadratic comparison.
  * A final `levenshtein ≤ 1` filter makes the result exact (the
  * deletion buckets alone admit distance-2 pairs).
  *
  * Scale shape: a string of length L explodes to L+1 variants, so the
  * shuffle carries O(corpus · avg_len) short rows keyed by variant —
  * an inverted index, the same layout as the MinHash/fingerprint
  * joins. Hot variants (a deletion shared by thousands of strings,
  * e.g. serial-numbered names) make skewed buckets with O(bucket²)
  * pair output — AQE skew splitting handles the shuffle side, and the
  * verify filter keeps only true matches; for adversarial corpora cap
  * buckets upstream the way [[Dedup.minhashPairs]]'s `maxBucketSize`
  * does (a cap here would silently drop TRUE pairs, which an
  * exact-semantics operator must not do by default).
  *
  * Everything is built-in codegen'd SQL (transform/sequence/
  * levenshtein) — no UDF.
  */
object FuzzyJoin {

  /** Distinct (id_a, s_a, id_b, s_b) pairs with id_a < id_b and
    * levenshtein(s_a, s_b) ≤ 1 (distance 0 included: distinct ids
    * carrying identical strings are reported).
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // spread BEFORE the explode: the corpus arrives as a single-file
    // parquet scan (one row group = one task), so without this the
    // variant generation — the op's CPU body, L+1 string slices per
    // row — and the broadcast hash build it feeds run on ONE core
    // (measured 2.7-3.1 s single-task at sf0.1; ~0.4 s spread across
    // the session's partitions). One tiny exchange of (id, s) rows
    // buys a fully parallel scan stage — guide §2.5 "input skew:
    // one unsplittable file → repartition immediately after the read".
    val base = Dedup.spread(df.select(col(idCol).as("id"), col(strCol).as("s")))
    // {self} ∪ single-character deletions; array_union dedups the
    // repeated variants a run of identical chars produces
    val variants = base.withColumn("variant", explode(array_union(
      array(col("s")),
      expr("""transform(sequence(1, length(s)),
                        i -> concat(substring(s, 1, i - 1),
                                    substring(s, i + 1, length(s))))"""))))
    val a = variants.select(col("id").as("id_a"), col("s").as("s_a"),
      col("variant"))
    val b = variants.select(col("id").as("id_b"), col("s").as("s_b"),
      col("variant"))
    // verify BEFORE the dedup so the distinct's shuffle carries only
    // true pairs; the threshold-bounded levenshtein early-exits after
    // the second mismatch (returns -1 past the bound)
    a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("s_a"), col("s_b"), 1) >= 0)
      .select(col("id_a"), col("s_a"), col("id_b"), col("s_b"))
      .distinct()
  }
}

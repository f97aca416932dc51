package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection over an embedding column —
  * the dimensionality-reduction front end of an at-scale similarity
  * pipeline (shrink 64-dim vectors to k dims BEFORE the all-pairs /
  * LSH machinery touches them; distance distortion is bounded by the
  * JL lemma).
  *
  * The projection matrix is Achlioptas' database-friendly sparse sign
  * matrix (Achlioptas, JCSS 2003): entries ±1 with probability 1/6
  * each, 0 with probability 2/3, scaled by √(3/k). Two consequences
  * matter here:
  *
  *  - the matrix is a TINY deterministic literal (k·d small ints from
  *    a seeded PRNG) baked into the plan — nothing is broadcast, no
  *    shuffle, the projection is a map-only codegen'd expression and
  *    the scan stays in one WholeStageCodegen span;
  *  - each output coordinate is a fixed-order chain of double adds of
  *    ±v_i, so the arithmetic is reproducible term-for-term in any
  *    engine that evaluates left-associative IEEE-754 double addition
  *    — which is what makes the operator EXACTLY oracle-checkable
  *    (the oracle SQL is generated from the same matrix, see
  *    [[graft.queries.ScaleQueries]]).
  *
  * 100 TB shape: map-only — zero exchange, embarrassingly parallel,
  * output is k/d the input width. The only driver-side state is the
  * k·d sign matrix (k=8, d=64 → 512 bytes).
  */
object Projection {

  /** Deterministic Achlioptas sign matrix: `outDim` rows × `inDim`
    * cols in {-1, 0, +1}, P(+1) = P(-1) = 1/6. Seeded — the same
    * (seed, shape) always yields the same matrix, in any JVM (the
    * scala.util.Random LCG is specified).
    */
  def signMatrix(outDim: Int, inDim: Int, seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(outDim, inDim) {
      val u = rnd.nextInt(6)
      if (u == 0) 1 else if (u == 1) -1 else 0
    }
    require(m.forall(_.exists(_ != 0)),
      s"degenerate all-zero projection row for seed=$seed — pick another seed")
    m
  }

  /** One projected coordinate: √(3/k) · Σᵢ sᵢ·vᵢ over the non-zero
    * signs, as a LEFT-ASSOCIATIVE add chain in increasing-i order
    * (the order contract the generated oracle SQL mirrors), rounded
    * to 4 decimals.
    */
  private def coord(vec: Column, row: Array[Int], k: Int): Column = {
    val terms = row.zipWithIndex.collect { case (s, i) if s != 0 =>
      val e = vec.getItem(i).cast("double")
      if (s > 0) e else -e
    }
    // + 0.0 normalizes IEEE negative zero: Spark's round() drops the
    // sign (BigDecimal path) while DuckDB's keeps it, and the
    // comparator is repr-sensitive — (-0.0 + 0) = 0.0 in both engines
    round(terms.reduceLeft(_ + _) * lit(math.sqrt(3.0 / k)), 4) + lit(0.0)
  }

  /** Project `vecCol` (array<float>, length ≥ inDim) down to
    * `mat.length` double columns `y0..y{k-1}` alongside `idCol`.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
              mat: Array[Array[Int]]): DataFrame = {
    val k = mat.length
    val cols = col(idCol) +: mat.zipWithIndex.map { case (row, j) =>
      coord(col(vecCol), row, k).as(s"y$j")
    }.toSeq
    df.select(cols: _*)
  }

  /** DuckDB SQL for the same projection over table `embeddings`
    * (vec_id, embedding) — generated from the SAME matrix so the two
    * engines evaluate term-for-term identical double arithmetic
    * (DuckDB list indexing is 1-based; sqrt and round are both
    * correctly-rounded IEEE doubles in both engines).
    */
  def oracleSql(mat: Array[Array[Int]]): String = {
    val k = mat.length
    val dims = mat.zipWithIndex.map { case (row, j) =>
      val body = row.zipWithIndex.collect { case (s, i) if s != 0 =>
        val t = s"CAST(embedding[${i + 1}] AS DOUBLE)"
        if (s > 0) s"+ $t" else s"- $t"
      }.mkString(" ").stripPrefix("+ ")
      s"round(($body) * sqrt(3.0/$k), 4) + 0.0 AS y$j"
    }
    s"SELECT vec_id, ${dims.mkString(", ")} FROM embeddings ORDER BY vec_id"
  }
}

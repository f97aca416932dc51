package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.VectorStatsAgg
import graft.ops.Pca

/** Property checks of the fused second-moment aggregate's
  * hand-indexed flat buffer (pure JVM — reduce/merge are plain
  * methods, so thousands of cases are cheap): the packed
  * [n, S, upper-tri P] layout must agree with the naive O(d²)
  * recompute for any vectors, and merge must equal reducing the
  * concatenation (the associativity partial aggregation relies on).
  */
object VectorStatsProps extends Properties("vector-stats") {

  private val dim: Gen[Int] = Gen.chooseNum(1, 9)
  private def vecs(d: Int): Gen[List[List[Long]]] =
    Gen.nonEmptyListOf(Gen.listOfN(d, Gen.chooseNum(-1200000L, 1200000L)))

  private def naive(rows: List[List[Long]])
      : (Long, Seq[BigInt], Seq[Seq[BigInt]]) = {
    val d = rows.head.length
    val s = (0 until d).map(i => rows.map(r => BigInt(r(i))).sum)
    val p = (0 until d).map(i => (0 until d).map(j =>
      rows.map(r => BigInt(r(i)) * r(j)).sum))
    (rows.size.toLong, s, p)
  }

  private def reduceAll(agg: VectorStatsAgg,
                        rows: List[List[Long]]): Array[Long] =
    rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, r))

  property("packed buffer == naive recompute") =
    forAll(dim.flatMap(vecs)) { rows =>
      val agg = new VectorStatsAgg
      val (n, s, p) = Pca.parseFlatStats(reduceAll(agg, rows).toSeq)
      val (n2, s2, p2) = naive(rows)
      n == n2 && s.toSeq == s2 && p.map(_.toSeq).toSeq == p2
    }

  property("merge(reduce(a), reduce(b)) == reduce(a ++ b)") =
    forAll(dim.flatMap(d => Gen.zip(vecs(d), vecs(d)))) { case (a, b) =>
      val agg = new VectorStatsAgg
      val merged = agg.merge(reduceAll(agg, a), reduceAll(new VectorStatsAgg, b))
      merged.toSeq == reduceAll(new VectorStatsAgg, a ++ b).toSeq
    }

  property("covFromStats identity == direct centered sums") =
    forAll(dim.flatMap(vecs)) { rows =>
      val agg = new VectorStatsAgg
      val stats = Pca.parseFlatStats(reduceAll(agg, rows).toSeq)
      val (mu, _) = Pca.momentsFromStats(stats)
      val cov = Pca.covFromStats(stats, mu)
      val d = rows.head.length
      (0 until d).forall(i => (0 until d).forall { j =>
        val direct = rows.map(r =>
          BigInt(r(i) - mu(i)) * (r(j) - mu(j))).sum
        cov(i)(j) == direct
      })
    }
}

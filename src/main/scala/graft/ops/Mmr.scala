package graft.ops

/** The greedy Maximal-Marginal-Relevance chain over ALREADY-BOUNDED
  * candidate integers (Carbonell & Goldstein, SIGIR 1998) — the
  * driver-side stage 2 of the `mmr_rerank` query: stage 1 (the
  * distributed exact/approximate top-k and the k² pairwise sims) is
  * Spark's job; this is pure integer arithmetic over ≤k candidates,
  * factored out so the selection logic is unit-testable against hand
  * fixtures.
  */
object Mmr {

  /** Select `k` of the candidates maximizing
    * score = λnum·rel − (λden−λnum)·max_{j∈S} sim(i,j) on the λden
    * basis (division-free). `rels` maps candidate id → rel_e4;
    * `sim(i, j)` must be defined for every ordered candidate pair.
    * Ties break by candidate id. Returns
    * (rank, cid, rel_e4, maxsim_e4, score) in selection order.
    */
  def greedy(rels: Map[Long, Long], sim: (Long, Long) => Long,
             k: Int, lNum: Long = 7L, lDen: Long = 10L)
      : Seq[(Int, Long, Long, Long, Long)] = {
    require(lNum > 0 && lNum <= lDen, s"lambda $lNum/$lDen not in (0,1]")
    var selected = Vector.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long)]
    val n = math.min(k, rels.size)
    for (r <- 1 to n) {
      val best = rels.keysIterator.filterNot(selected.contains)
        .map { c =>
          val ms = if (selected.isEmpty) 0L
            else selected.iterator.map(j => sim(c, j)).max
          (c, rels(c), ms, lNum * rels(c) - (lDen - lNum) * ms)
        }
        .minBy { case (c, _, _, sc) => (-sc, c) }
      selected :+= best._1
      out += ((r, best._1, best._2, best._3, best._4))
    }
    out.toSeq
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al., ACL'16) — the
  * tokenizer-training step of an LLM data pipeline, distributed the
  * way the algorithm factors naturally on Spark:
  *
  *   - the corpus collapses ONCE into a word-frequency dict
  *     (|distinct words| rows — the only state the loop touches;
  *     at 100 TB this is ~10⁸ rows, not 10¹² tokens);
  *   - each iteration is one pair-count aggregate (explode adjacent
  *     symbol pairs, map-side combine, shuffle |pair vocab| rows)
  *     plus a 1-row argmax collect;
  *   - applying a merge is a scan-stage regexp projection over the
  *     dict, so the per-iteration cost is independent of corpus size.
  *
  * Production BPE batches many merges between recounts; this trains
  * one merge per recount (the textbook algorithm) because the merge
  * list, not wall-clock, is the contract under test. The full merge
  * list is oracle-verified: `bpe_merges`' DuckDB SQL replays the
  * whole training loop as an unrolled CTE chain (see
  * TextQueries.bpeOracle). Max pair count is provably non-increasing
  * across merges (every pair created by a merge occurs at most as
  * often as the pair just merged, and every surviving pair was
  * already ≤ the previous max), pinned in BpeSpec.
  */
object Bpe {

  /** One learned merge: at `rank`, join symbols `left`+`right`
    * (occurring `n` times, frequency-weighted over words).
    */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Corpus → word-frequency dict with each word exploded to
    * space-separated single-character symbols ("hello" → "h e l l o").
    * Lowercased, ASCII-alpha words only, so symbols stay regex-safe
    * and both engines tokenize identically.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // split at interior positions only: a bare (?!^) also matches at
      // end-of-string, which appends a trailing "" symbol (and a
      // phantom (lastChar, "") pair in pairCounts)
      .select(concat_ws(" ", split(col("w"), "(?!^)(?!$)")).as("sym"),
        col("freq"))

  /** Frequency-weighted adjacent-pair counts over the dict. */
  def pairCounts(dict: DataFrame): DataFrame = {
    val toks = split(col("sym"), " ")
    dict.select(col("freq"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a: Column, b: Column) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n"))
  }

  /** Number of literal-replace passes in [[applyMerge]]. Each pass
    * merges at least half the surviving occurrences in an alternating
    * run (" a b a b … "), so `p` passes reach the fixpoint for runs up
    * to 2^(p-1) pairs — 8 covers any word under ~256 symbols, far past
    * the `[a-z]+` word lengths in any corpus.
    */
  val ReplacePasses = 8

  /** Merge adjacent symbols `l`,`r` in a space-separated symbol
    * string: pad with sentinels, literal-replace " l r "→" lr " to
    * fixpoint, trim. The fixpoint of left-to-right non-overlapping
    * literal replace equals greedy BPE merge application (a pass can
    * only miss an occurrence whose leading space the previous match
    * consumed; the next pass sees it, and replacements never create a
    * new " l r " because merged tokens contain no space). Literal —
    * not regex — so DuckDB's RE2-based oracle replays it exactly
    * (Java lookarounds have no RE2 equivalent).
    */
  def applyMerge(sym: Column, l: String, r: String): Column = {
    var e: Column = concat(lit(" "), sym, lit(" "))
    for (_ <- 1 to ReplacePasses)
      e = replace(e, lit(s" $l $r "), lit(s" $l$r "))
    trim(e)
  }

  /** Apply a trained merge list to a corpus: per-document word and
    * BPE-token counts. Pure scan-stage work — the merge list rides
    * into the plan as literals (64 nested `replace`s for 8 merges ×
    * [[ReplacePasses]]), each word is char-split and folded through
    * the merges in rank order inside array lambdas, so no explode, no
    * shuffle, and the whole projection stays in whole-stage codegen.
    * Word normalization matches [[wordDict]] (lowercase, ASCII-alpha
    * only) so counts are consistent with what training saw.
    */
  def encodeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
                        merges: Seq[Merge]): DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"),
      (w: Column) => w.rlike("^[a-z]+$"))
    val encoded = transform(words, (w: Column) =>
      merges.foldLeft(concat_ws(" ", split(w, "(?!^)(?!$)"))) {
        (sym, m) => applyMerge(sym, m.left, m.right)
      })
    docs.select(col(idCol),
      size(words).cast("long").as("n_words"),
      aggregate(encoded, lit(0L),
        (acc: Column, sym: Column) =>
          acc + size(split(sym, " ")).cast("long")).as("n_tokens"))
  }

  /** Train `nMerges` merges. Ties break lexicographically on
    * (left, right) so training is deterministic. Each round persists
    * the re-symbolized dict and unpersists the previous one; the only
    * driver traffic is the 1-row argmax per round.
    */
  def train(dict0: DataFrame, nMerges: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var dict = dict0.persist()
    try {
      var done = false
      while (!done && out.size < nMerges) {
        val top = pairCounts(dict)
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (l, r, n) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          out += Merge(out.size + 1, l, r, n)
          val next = dict
            .withColumn("sym", applyMerge(col("sym"), l, r))
            .persist()
          next.count()
          dict.unpersist()
          dict = next
        }
      }
      out.toSeq
    } finally dict.unpersist()
  }
}

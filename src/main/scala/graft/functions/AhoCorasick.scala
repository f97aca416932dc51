package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton (Aho & Corasick, CACM 1975) for
  * multi-pattern substring matching in ONE pass over the text.
  *
  * This is the scale answer to blocklist / quality-phrase filtering of
  * a training corpus: matching a document against P phrases with
  * per-phrase `contains` costs O(P·n) per document (and as a join it
  * is a P-way fan-out); the automaton costs O(n + matches) per
  * document REGARDLESS of P. The automaton is built once on the
  * driver from the phrase list and shipped to executors inside the
  * serialized plan (exactly like a broadcast variable), so the build
  * cost and the per-executor memory are amortized over billions of
  * rows.
  *
  * Matching runs over raw UTF-8 bytes. Because UTF-8 is
  * self-synchronizing, a byte-level match of a valid-UTF-8 needle
  * inside valid-UTF-8 text is always a character-level match, so the
  * semantics equal SQL `contains(text, pattern)` per pattern.
  * Substring semantics are intentional (no word-boundary logic here —
  * compose with the tokenizer when boundaries matter).
  *
  * Layout: a dense 256-way transition table per node, converted to a
  * full DFA by splicing failure transitions during the BFS (goto is
  * total, so the per-byte step is one array load — codegen-friendly,
  * no branching on failure chains). Memory is O(Σ|p| · 256 · 4 B):
  * fine for the 10²–10⁴-phrase lists used here; a 10⁵–10⁶-phrase
  * production blocklist would swap in a double-array or sparse-row
  * trie layout (same interface, ~10× smaller) — the query shape and
  * the one-pass guarantee are unchanged.
  *
  * Output links: `emitHead`/`emitNext` form per-node chains of ALL
  * pattern ids ending at that node (including patterns that are
  * proper suffixes of others — "sort" must surface inside a "merge
  * sort" match), precomputed at build time by inheriting the failure
  * target's chain.
  */
final class AhoCorasick private (
    goto256: Array[Int],        // nNodes × 256, failure-spliced (DFA)
    emitHead: Array[Int],       // node -> first emit index or -1
    emitPattern: Array[Int],    // emit index -> pattern id
    emitNext: Array[Int],       // emit index -> next emit index or -1
    val numPatterns: Int) extends Serializable {

  /** Sorted distinct ids of every pattern occurring in `s` as a byte
    * substring. Never throws; empty array for no matches.
    */
  def matchIds(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val hit = new Array[Boolean](numPatterns)
    var nHit = 0
    var state = 0
    var i = 0
    while (i < bytes.length && nHit < numPatterns) {
      state = goto256((state << 8) | (bytes(i) & 0xff))
      var e = emitHead(state)
      while (e != -1) {
        val p = emitPattern(e)
        if (!hit(p)) { hit(p) = true; nHit += 1 }
        e = emitNext(e)
      }
      i += 1
    }
    val out = new Array[Any](nHit)
    var p = 0
    var k = 0
    while (p < numPatterns) {
      if (hit(p)) { out(k) = p.toLong; k += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }
}

object AhoCorasick {

  /** Build the failure-spliced DFA from `patterns` (order defines the
    * emitted pattern ids). Empty patterns are rejected — an empty
    * needle "matches everywhere" has no useful blocklist meaning and
    * silently inflating every row's match set would be a data bug.
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "empty pattern list")
    val pats = patterns.map(_.getBytes("UTF-8"))
    require(pats.forall(_.nonEmpty), "empty pattern")

    // Trie construction over a growable node table.
    // the byte sum itself is computed in Long: an Int sum would wrap
    // for >2 GB of patterns and sail PAST the guard below
    val maxNodesL = pats.map(_.length.toLong).sum + 1
    require(maxNodesL <= Int.MaxValue / 256,
      s"pattern list too large for the dense AC table: $maxNodesL trie " +
        s"nodes x 256 exceeds Int.MaxValue cells (summed pattern bytes " +
        s"must stay under ${Int.MaxValue / 256 - 1})")
    val maxNodes = maxNodesL.toInt
    val next = Array.fill(maxNodes * 256)(-1)
    var nNodes = 1
    val emitHeadB = Array.fill(maxNodes)(-1)
    val emitPatternB = new Array[Int](pats.length)
    val emitNextB = new Array[Int](pats.length)
    var nEmit = 0
    var pid = 0
    while (pid < pats.length) {
      val p = pats(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (next((node << 8) | c) == -1) {
          next((node << 8) | c) = nNodes
          nNodes += 1
        }
        node = next((node << 8) | c)
        i += 1
      }
      emitPatternB(nEmit) = pid
      emitNextB(nEmit) = emitHeadB(node)
      emitHeadB(node) = nEmit
      nEmit += 1
      pid += 1
    }

    // BFS: compute failure links, splice them into the transition
    // table (making goto total), and inherit the failure target's
    // emit chain so every suffix-pattern surfaces without runtime
    // failure-chain walks.
    val fail = new Array[Int](nNodes)
    val queue = new Array[Int](nNodes)
    var qh = 0
    var qt = 0
    var c = 0
    while (c < 256) {
      val v = next(c)
      if (v == -1) next(c) = 0
      else { fail(v) = 0; queue(qt) = v; qt += 1 }
      c += 1
    }
    while (qh < qt) {
      val u = queue(qh); qh += 1
      // Append the failure target's emit chain (it is already fully
      // resolved — BFS order guarantees fail(u) was processed first).
      if (emitHeadB(fail(u)) != -1) {
        if (emitHeadB(u) == -1) emitHeadB(u) = emitHeadB(fail(u))
        else {
          var e = emitHeadB(u)
          while (emitNextB(e) != -1) e = emitNextB(e)
          emitNextB(e) = emitHeadB(fail(u))
        }
      }
      c = 0
      while (c < 256) {
        val v = next((u << 8) | c)
        if (v == -1) next((u << 8) | c) = next((fail(u) << 8) | c)
        else { fail(v) = next((fail(u) << 8) | c); queue(qt) = v; qt += 1 }
        c += 1
      }
    }

    new AhoCorasick(
      java.util.Arrays.copyOf(next, nNodes * 256),
      java.util.Arrays.copyOf(emitHeadB, nNodes),
      emitPatternB, emitNextB, pats.length)
  }
}

package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AhoCorasick

/** Aho–Corasick automaton vs the naive per-pattern `contains`
  * definition (pure JVM — no Spark session, so thousands of cases are
  * cheap). The property generator draws patterns AND text from a
  * 2-letter alphabet so overlaps, shared prefixes, and
  * suffix-patterns (the failure-link and emit-inheritance paths) are
  * hit constantly rather than almost never.
  */
object AhoCorasickSpec extends Properties("ahocorasick") {

  private def ids(ac: AhoCorasick, s: String): Seq[Long] = {
    val a = ac.matchIds(UTF8String.fromString(s))
    (0 until a.numElements()).map(a.getLong)
  }

  private def naive(pats: Seq[String], s: String): Seq[Long] =
    pats.zipWithIndex.collect { case (p, i) if s.contains(p) => i.toLong }

  private val denseStr: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b')).map(_.mkString)
  private val densePats: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf('a', 'b'))
      .map(_.take(4).mkString))

  property("matchIds == per-pattern contains (dense 2-letter alphabet)") =
    forAll(densePats, denseStr) { (pats, text) =>
      ids(AhoCorasick.build(pats), text) == naive(pats, text)
    }

  property("matchIds == per-pattern contains (arbitrary unicode)") =
    forAll(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)),
           Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { (pats, text) =>
      ids(AhoCorasick.build(pats), text) == naive(pats, text)
    }

  property("suffix pattern surfaces inside longer match") = {
    // "sort" must emit whenever "merge sort" does (emit-chain
    // inheritance via the failure link), and ids come out sorted.
    val ac = AhoCorasick.build(Seq("merge sort", "sort", "merge"))
    ids(ac, "a merge sort b") == Seq(0L, 1L, 2L) &&
      ids(ac, "sorted") == Seq(1L) &&
      ids(ac, "merge so") == Seq(2L)
  }

  property("multibyte UTF-8 needles match at byte level") = {
    val ac = AhoCorasick.build(Seq("naïve", "é", "日本"))
    ids(ac, "a naïve café 日本語 test") == Seq(0L, 1L, 2L) &&
      ids(ac, "plain ascii") == Seq()
  }

  property("duplicate patterns each emit their own id") = {
    val ac = AhoCorasick.build(Seq("ab", "ab", "b"))
    ids(ac, "xabx") == Seq(0L, 1L, 2L)
  }

  property("empty text matches nothing; never throws on any bytes") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val ac = AhoCorasick.build(Seq("ab", "ba"))
      ids(ac, "") == Seq() && {
        ac.matchIds(UTF8String.fromBytes(bs.toArray)); true
      }
    }
}

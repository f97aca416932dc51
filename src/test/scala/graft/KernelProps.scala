package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

/** Property-based checks of the native kernels (pure JVM — no Spark
  * session needed, so thousands of cases are cheap).
  */
object KernelProps extends Properties("kernels") {

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
  private def utf8(s: String) = UTF8String.fromString(s)

  private val sortedDistinct: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)

  property("sortedIntersectCountLong == set intersection size") =
    forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      Kernels.sortedIntersectCountLong(arr(a), arr(b)) ==
        a.toSet.intersect(b.toSet).size
    }

  property("sortedIntersectCountString == set intersection size") =
    forAll(Gen.listOf(Gen.alphaStr), Gen.listOf(Gen.alphaStr)) { (a0, b0) =>
      val a = a0.distinct.sorted
      val b = b0.distinct.sorted
      val aa = new GenericArrayData(a.map(utf8).toArray[Any])
      val bb = new GenericArrayData(b.map(utf8).toArray[Any])
      Kernels.sortedIntersectCountString(aa, bb) ==
        a.toSet.intersect(b.toSet).size
    }

  private val words: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))

  property("shingleSet invariant under separator choice and case") =
    forAll(words) { ws =>
      val sp = utf8(ws.mkString(" "))
      val punct = utf8(ws.mkString(",,  !"))
      val upper = utf8(ws.mkString(" ").toUpperCase)
      val a = Kernels.shingleSet(sp, 3)
      val b = Kernels.shingleSet(punct, 3)
      val c = Kernels.shingleSet(upper, 3)
      a.toLongArray.toSeq == b.toLongArray.toSeq &&
        a.toLongArray.toSeq == c.toLongArray.toSeq
    }

  property("shingleSet output is sorted distinct") =
    forAll(words) { ws =>
      val out = Kernels.shingleSet(utf8(ws.mkString(" ")), 3).toLongArray.toSeq
      out == out.distinct.sorted
    }

  property("minhash similarity estimates true jaccard (128 hashes)") =
    forAll(Gen.chooseNum(0, 40), Gen.chooseNum(1, 40)) { (shared, extra) =>
      // two sets with `shared` common and `extra` private elements each
      val common = (1L to shared.toLong).map(Kernels.mix64)
      val pa = (1001L to 1000L + extra).map(Kernels.mix64)
      val pb = (2001L to 2000L + extra).map(Kernels.mix64)
      val a = arr((common ++ pa).distinct.sorted)
      val b = arr((common ++ pb).distinct.sorted)
      val sa = Kernels.minhash(a, 128, 42L).toLongArray
      val sb = Kernels.minhash(b, 128, 42L).toLongArray
      val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
      val truth = shared.toDouble / (shared + 2.0 * extra)
      math.abs(est - truth) < 0.25 // ±5.7σ at n=128
    }

  property("cosine(v, v) == 1 for nonzero vectors") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100, 100).map(_.toFloat))) { v =>
      val nz = if (v.forall(_ == 0f)) v.updated(0, 1f) else v
      val a = new GenericArrayData(nz.toArray[Any])
      math.abs(Kernels.cosine(a, a) - 1.0) < 1e-9
    }

  property("cosine symmetry and scale invariance") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-50, 50).map(_.toFloat)),
      Gen.nonEmptyListOf(Gen.chooseNum(-50, 50).map(_.toFloat))) { (x, y) =>
      val n = math.min(x.length, y.length)
      val a0 = x.take(n); val b0 = y.take(n)
      (a0.exists(_ != 0f) && b0.exists(_ != 0f)) ==> {
        val a = new GenericArrayData(a0.toArray[Any])
        val b = new GenericArrayData(b0.toArray[Any])
        val a2 = new GenericArrayData(a0.map(_ * 2f).toArray[Any])
        val ab = Kernels.cosine(a, b)
        val ba = Kernels.cosine(b, a)
        val sc = Kernels.cosine(a2, b)
        math.abs(ab - ba) < 1e-12 && math.abs(ab - sc) < 1e-6
      }
    }

  property("simhash of identical input is identical; hamming ≤ 64") =
    forAll(sortedDistinct) { xs =>
      val h1 = Kernels.simhash64(arr(xs))
      val h2 = Kernels.simhash64(arr(xs))
      h1 == h2
    }

  property("winnow: every fingerprint is some k-gram hash; sorted distinct") =
    forAll(Gen.alphaStr.suchThat(_.length >= 12)) { s =>
      val out = Kernels.winnow(utf8(s), 8, 4).toLongArray.toSeq
      out == out.distinct.sorted
    }

  property("winnowMaxGap: within w on any text; 0 when single window") =
    forAll(Gen.alphaStr) { s =>
      val g = Kernels.winnowMaxGap(utf8(s), 8, 4)
      val singleWindow = s.length < 8 + 4 // nk ≤ w → one window
      if (singleWindow) g == 0L else g >= 0L && g <= 4L
    }

  property("srpProbes: head is srpBucket; probes distinct, in range, " +
      "cost-ordered, full enumeration covers every bucket") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100, 100).map(_.toFloat)),
      Gen.chooseNum(1, 8), Gen.chooseNum(1L, 999L)) { (v, bits, seed) =>
      val a = new GenericArrayData(v.toArray[Any])
      val m = 1 << bits
      val full = Kernels.srpProbes(a, bits, seed, m)
      val probes = (0 until full.numElements()).map(full.getLong)
      val base = Kernels.srpBucket(a, bits, seed)
      // flip cost of probe p = Σ|projection| over bits where p differs
      // from the base bucket — recompute independently
      def cost(p: Long): Double = (0 until bits).map { b =>
        if (((p ^ base) & (1L << b)) != 0L) {
          var acc = 0.0
          var i = 0
          while (i < v.length) {
            val r = Kernels.mix64(seed + b * 131071L + i)
            acc += (if ((r & 1L) == 0L) 1.0 else -1.0) * v(i)
            i += 1
          }
          math.abs(acc)
        } else 0.0
      }.sum
      val costs = probes.map(cost)
      probes.head == base &&
        probes.distinct.length == m &&
        probes.forall(p => p >= 0 && p < m) &&
        costs.zip(costs.tail).forall { case (x, y) => x <= y + 1e-9 } &&
        Kernels.srpProbes(a, bits, seed, 3).numElements() == math.min(3, m)
    }

  property("interleave2 round-trips both 32-bit inputs") =
    forAll(Gen.chooseNum(0L, 0xffffffffL), Gen.chooseNum(0L, 0xffffffffL)) {
      (a, b) =>
        val z = Kernels.interleave2(a, b)
        var ra = 0L; var rb = 0L
        var i = 0
        while (i < 32) {
          ra |= ((z >>> (2 * i)) & 1L) << i
          rb |= ((z >>> (2 * i + 1)) & 1L) << i
          i += 1
        }
        ra == a && rb == b
    }

  // A 100 TB crawl always contains garbage: the container-header
  // parsers must return (never throw, never loop) on ARBITRARY bytes —
  // including bytes that start with a valid magic and then lie about
  // chunk/segment sizes.
  private val bytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
  private def prefixed(magic: Array[Byte]): Gen[Array[Byte]] =
    bytes.map(b => magic ++ b)

  property("parseMediaHeader total on arbitrary bytes") =
    forAll(bytes) { b => Kernels.parseMediaHeader(b).numElements() == 4 }

  property("parseMediaHeader total behind valid magics") =
    forAll(Gen.oneOf(
      prefixed(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)),
      prefixed(Array(0xff, 0xd8).map(_.toByte)),
      prefixed("BM".getBytes),
      prefixed("GIF89a".getBytes))) { b =>
      Kernels.parseMediaHeader(b).numElements() == 4
    }

  property("parseAudioHeader total on arbitrary bytes") =
    forAll(bytes) { b => Kernels.parseAudioHeader(b).numElements() == 5 }

  property("parseAudioHeader total behind valid magics") =
    forAll(Gen.oneOf(
      prefixed("RIFF0000WAVE".getBytes),
      prefixed("fLaC".getBytes))) { b =>
      Kernels.parseAudioHeader(b).numElements() == 5
    }

  property("audio header synthesize→parse identity") =
    forAll(Gen.oneOf(1, 2), Gen.chooseNum(1, 1 << 19),
      Gen.chooseNum(1, 8), Gen.oneOf(8, 16, 24, 32),
      Gen.chooseNum(0L, 1L << 30)) { (fmt, rate, ch, bits, frames0) =>
      // WAV (RIFF32) caps sample data at 4 GiB — makeAudioHeader
      // require()s it (found by this property); stay inside the format
      val frames =
        if (fmt == 1) math.min(frames0, 0xffffffffL / (ch * bits / 8))
        else frames0
      val p = Kernels.parseAudioHeader(
        Kernels.makeAudioHeader(fmt, rate, ch, bits, frames))
      (0 until 5).map(p.getLong) ==
        Seq(fmt.toLong, rate.toLong, ch.toLong, bits.toLong, frames)
    }

  property("makeAudioHeader rejects WAV payloads beyond RIFF32") =
    Prop(scala.util.Try(
      Kernels.makeAudioHeader(1, 48000, 8, 32, 1L << 32)).isFailure)

  property("parseVideoHeader total on arbitrary bytes") =
    forAll(bytes) { b => Kernels.parseVideoHeader(b).numElements() == 5 }

  property("parseVideoHeader total behind a valid ftyp") =
    forAll(Gen.oneOf(
      prefixed(Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
        Array[Byte](0, 0, 0, 0)),
      prefixed(Array[Byte](0, 0, 0, 16) ++ "ftypqt  ".getBytes ++
        Array[Byte](0, 0, 0, 0)))) { b =>
      Kernels.parseVideoHeader(b).numElements() == 5
    }

  property("video header synthesize→parse identity") =
    forAll(Gen.oneOf(1, 2), Gen.oneOf(0, 1), Gen.chooseNum(1, 1 << 20),
      Gen.chooseNum(0L, 1L << 40), Gen.chooseNum(0, 12)) {
      (fmt, ver, ts, dur0, tracks) =>
      // v0 stores 32-bit durations — makeVideoHeader require()s it
      val dur = if (ver == 0) dur0 & 0xffffffffL else dur0
      val p = Kernels.parseVideoHeader(
        Kernels.makeVideoHeader(fmt, ver, ts, dur, tracks))
      (0 until 5).map(p.getLong) ==
        Seq(fmt.toLong, ver.toLong, ts.toLong, dur, tracks.toLong)
    }

  property("makeVideoHeader rejects 64-bit durations at mvhd v0") =
    Prop(scala.util.Try(
      Kernels.makeVideoHeader(1, 0, 600, 1L << 32, 1)).isFailure)

  // Text kernels must be total on arbitrary unicode (a web crawl
  // contains every codepoint sequence there is, including lone
  // surrogates after a bad transcode).
  private val anyText: Gen[UTF8String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', '\n', '\u0000', 'é', '中', '\ud83d'),
      Gen.chooseNum(0, 0xffff).map(_.toChar)))
      .map(cs => utf8(cs.mkString))

  property("text kernels total on arbitrary unicode") =
    forAll(anyText) { s =>
      Kernels.tokensLower(s).numElements() >= 0 &&
      Kernels.qualityE4(s) >= 0L &&
      Kernels.chunkTokens(s, 16, 8).numElements() >= 0 &&
      Kernels.lineStats(s).numElements() == 4 &&
      Kernels.ngramRepStats(s, 2).numElements() == 3 &&
      Kernels.shingleSet(s, 3).numElements() >= 0 &&
      Kernels.winnow(s, 8, 4).numElements() >= 0
    }

  // URL-shaped generator: every structural feature the canonicalizer
  // handles (case, ports, dup/trailing slashes, utm params, unsorted
  // params, fragments) drawn independently, plus pure-junk inputs via
  // anyText in the totality property below.
  private val urlish: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http", "ftp")
    host <- Gen.oneOf("A.B.c", "WWW.Example.COM", "x.org", "")
    port <- Gen.oneOf("", ":443", ":80", ":8080")
    path <- Gen.listOf(Gen.oneOf("/a", "//b", "/", "/c.html")).map(_.mkString)
    query <- Gen.oneOf("", "?", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=2&a=0",
      "?&&x=1")
    frag <- Gen.oneOf("", "#f", "#a?b=1")
  } yield s"$scheme://$host$port$path$query$frag"

  property("canonicalizeUrl is idempotent on url-shaped input") =
    forAll(urlish) { u =>
      val once = Kernels.canonicalizeUrl(utf8(u))
      Kernels.canonicalizeUrl(once) == once
    }

  property("canonicalizeUrl total + idempotent on arbitrary unicode") =
    forAll(anyText) { s =>
      val once = Kernels.canonicalizeUrl(s)
      Kernels.canonicalizeUrl(once) == once
    }

  property("hrwShard: in range, and growing n moves a key IFF the new " +
      "shard wins (the elastic-resharding guarantee)") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
           Gen.chooseNum(1, 32)) { (k, n) =>
      val a = Kernels.hrwShard(k, n, 42L)
      val b = Kernels.hrwShard(k, n + 1, 42L)
      a >= 0 && a < n && (a == b || b == n) &&
        Kernels.hrwShard(k, 1, 42L) == 0
    }

  property("TopKMax: any reduce/merge tree equals global sort-take") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(-50L, 50L),
                              Gen.chooseNum(0L, 20L))),
           Gen.chooseNum(1, 5), Gen.chooseNum(0, 3)) { (xs0, k, cut) =>
      import graft.functions.{TopKMax, TopVal}
      val xs = xs0.map { case (v, id) => TopVal(v, id) }
      val agg = new TopKMax(k)
      val expected = xs.sortBy(t => (-t.v, t.id)).take(k)
      // arbitrary split: reduce each part, merge in either order
      val (a, b) = xs.splitAt(math.min(cut * xs.size / 3, xs.size))
      val pa = a.foldLeft(agg.zero)(agg.reduce)
      val pb = b.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(pa, pb)) == expected &&
        agg.finish(agg.merge(pb, pa)) == expected
    }

  property("canonicalizeUrl fixed rules") = {
    def c(s: String) = Kernels.canonicalizeUrl(utf8(s)).toString
    c("HTTPS://WWW.Ex.COM:443//a/b/?b=2&a=1&utm_s=x#frag") ==
      "https://www.ex.com/a/b?a=1&b=2" &&
    c("http://h:80/p") == "http://h/p" &&
    c("http://h:8080/p/") == "http://h:8080/p" &&
    c("https://h:80/p") == "https://h:80/p" && // :80 not default for https
    c("https://h/?utm_a=1") == "https://h" &&
    c("no scheme here") == "no scheme here" &&
    c("://emptyhost") == "://emptyhost"
  }
}

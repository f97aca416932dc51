package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything here is a narrow per-row projection built from codegen'd
  * built-ins (regexp/length/HOFs) — no UDFs, no shuffle; at 100 TB
  * these pipeline into the scan stage. Only fingerprinting fans out
  * (explode), and that output is (doc, fp) pairs made for a subsequent
  * groupBy-on-fp join, which is the actual dedup shuffle.
  */
object TextOps {

  /** Whitespace token count (empty tokens excluded). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword proxy count: alnum runs + isolated non-alnum,
    * non-space chars — the standard cheap pre-tokenizer estimate.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Non-whitespace character count. */
  def contentChars(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Punctuation ratio over all characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / greatest(length(text), lit(1))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords — a fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    size(filter(toks, t => t.isInCollection(Stopwords))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Composite quality score in [0,1]: length saturation + low
    * punctuation + stopword fluency. Weights are heuristic; the point
    * is the wiring (all codegen'd scalar math over the scan).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    lit(0.4) * lenScore +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * least(stopwordRatio(text) * 5.0, lit(1.0))
  }

  /** [[qualityScore]] as an exact scaled integer (score × 10⁴, floor):
    * the whole computation is integer arithmetic over token/char
    * counts, so any engine produces bit-identical results — float
    * `round()` at a decimal boundary is engine-dependent (Spark
    * BigDecimal HALF_UP vs DuckDB's scaled-multiply), observed
    * flipping the 4th decimal at sf0.1.
    *
    * score = 0.4·min(nt,100)/100 + 0.3·(len−p)/len + 0.3·min(5s,nt)/nt
    * as the exact rational N10/D10 with
    *   N10 = 4·min(nt,100)·len·nt + 300·(len−p)·nt + 300·min(5s,nt)·len
    *   D10 = 1000·len·nt   (len, nt floored at 1)
    */
  def qualityScoreE4(text: Column): Column =
    // one-pass codegen kernel (graft.functions.Kernels.qualityE4) —
    // the equivalent HOF chain (split/filter/isInCollection ×2) is
    // INTERPRETED and was re-evaluated per referencing operator, which
    // made the quality-thresholded sampling filter ~13× slower than
    // this scan; the kernel computes the identical integer math
    graft.functions.dsl.quality_e4(text)

  /** Marker words per language for the n-gram-free language-ID
    * heuristic. Deliberately tiny: language ID at corpus scale is a
    * cheap scan-stage filter, not a model.
    */
  /** PII patterns kept in the RE2 ∩ java.util.regex common dialect so
    * the DuckDB oracle evaluates the SAME expressions (no lookbehind,
    * no backrefs).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redact emails/phones (the pre-training scrub pass). Built-in
    * codegen'd `regexp_replace` — a linear scan-stage projection at
    * any scale, like the other text signals.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** Redaction counts (what a scrub report aggregates). */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailRe)), regexp_count(text, lit(PhoneRe)))

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht"),
    "es" -> Seq("el", "la", "que", "los", "una", "por"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans"))

  /** Predicted language: arg-max of marker-word hits with a fixed
    * priority order (declaration order) on ties — deterministic and
    * expressible in ANSI SQL for the oracle.
    */
  def langId(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    // lang_i wins if its score >= every later score and > every earlier
    // (strictly-greater vs earlier = first-declared wins ties)
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val beatsEarlier = scores.take(i).map { case (_, s2) => s > s2 }
      val beatsLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
      // a language needs at least one marker hit — zero evidence is
      // 'und', not the first-declared language
      val cond = (beatsEarlier ++ beatsLater)
        .foldLeft(s > 0)((a, b) => a && b)
      (cond, lit(lang))
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), acc) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * k-gram rolling hashes, min per sliding window of w, distinct.
    * Returns (id, fp) pairs — exploded so a groupBy on fp finds
    * cross-document shared fingerprints (the near-dup/cluster join).
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, w: Int = 4): DataFrame = {
    import graft.functions.dsl.winnow_fps
    Dedup.spread(df.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(winnow_fps(col(textCol), k, w)).as("fp"))
  }
}

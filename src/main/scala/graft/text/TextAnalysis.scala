package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting — all pure
  * Column expressions with DuckDB-oracle-portable formulations, applied
  * over the `documents` table (the graft analogues of the reference's
  * EDA/quality stages F2-F3, clean_and_parse.py:203-216).
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deterministic, data-independent. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  private def toks(c: Column): Column = filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Stopword-hit count for one language profile (multiset count, not
    * set intersection — repeated stopwords keep their weight). */
  def langScore(c: Column, words: Seq[String]): Column =
    size(filter(toks(c), t => t.isin(words.map(lit(_)): _*)))

  /** Language-ID: argmax of profile scores, ties broken by profile
    * order; no hits at all -> "und" (undetermined). */
  def langId(c: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => (l, langScore(c, ws)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  def langIdSqlDuck(e: String): String = {
    def score(ws: Seq[String]) =
      s"len(list_filter(string_split_regex(lower($e), '\\s+'), t -> t <> '' AND t IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val best = langProfiles.map(p => score(p._2)).reduce((a, b) => s"greatest($a, $b)")
    langProfiles.reverse.foldLeft(s"'und'") { case (acc, (l, ws)) =>
      s"(CASE WHEN ${score(ws)} = $best AND $best > 0 THEN '$l' ELSE $acc END)"
    }
  }

  /** Quality metrics (F2/F3 family): char length, word count, digit
    * count, punct count, stopword ratio, plus the reference's
    * `is_suspicious` flag (clean_and_parse.py:203-216: short/long/
    * wordless/digitless). */
  def qualityColumns(c: Column): Seq[(String, Column)] = {
    val charLen = length(c)
    val wordLen = size(toks(c))
    val digitCnt = length(regexp_replace(c, "[^0-9]", ""))
    val punctCnt = length(regexp_replace(c, "[a-zA-Z0-9\\s]", ""))
    val stopCnt = langScore(c, langProfiles.flatMap(_._2).distinct)
    Seq(
      "char_len" -> charLen,
      "word_len" -> wordLen,
      "digit_count" -> digitCnt,
      "punct_count" -> punctCnt,
      "stop_ratio" -> round(stopCnt.cast("double") /
        greatest(wordLen, lit(1)).cast("double"), 6),
      "is_suspicious" -> ((charLen < 10) || (wordLen < 2) || (charLen > 180) ||
        (digitCnt === 0)).cast("int"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (`\w+` runs plus single non-space symbols — counted via two
    * regexp_extract_all passes; RE2-portable, no lookarounds). */
  def tokenCounts(c: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(toks(c)),
    "bpe_ish_tokens" ->
      (size(regexp_extract_all(c, lit("[a-zA-Z0-9_]+"), lit(0))) +
        size(regexp_extract_all(c, lit("[^a-zA-Z0-9_\\s]"), lit(0)))))

  /** Document fingerprint: 60-bit md5 hash of the sorted distinct token
    * set — an order-insensitive near-dup key (the "sorted token
    * signature" trick; cheap map-side, shuffle-free until the final
    * groupBy on the fingerprint). */
  def fingerprint(c: Column): Column =
    conv(substring(md5(array_join(array_sort(array_distinct(toks(c))), " ")), 1, 15), 16, 10)
      .cast("long")

  def fingerprintSqlDuck(e: String): String =
    s"""CAST(('0x' || substr(md5(array_to_string(list_sort(list_distinct(
       |list_filter(string_split_regex(lower($e), '\\s+'), t -> t <> ''))), ' ')), 1, 15)) AS BIGINT)"""
      .stripMargin.replaceAll("\n", "")
}

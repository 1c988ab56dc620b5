package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full-fidelity Spark port of the reference's Turkish address
  * normalization (`/root/reference/addresskit/preprocessing/
  * normalize_and_parse.py:55-77` `clean_text`, plus the generic
  * config-driven chain of normalize.py:85-136). Pure Column expressions;
  * Java regex (lookbehind/lookahead allowed — this chain is verified by
  * golden vectors generated from the reference code, not by DuckDB).
  *
  * Turkish regex note (SURVEY.md §7.4.3): python's `re` treats `\b`
  * against the unicode word class, Java defaults to ASCII — every
  * pattern is therefore compiled with `(?U)` (UNICODE_CHARACTER_CLASS)
  * so boundaries behave identically around ğüşöçı.
  */
object ReferenceNormalizer {

  /** tr_safe_lower (normalize.py:40-46, match.py:42-47): İ->I variant. */
  def trSafeLower(c: Column): Column =
    lower(regexp_replace(translate(c, "İ", "I"), "̇", ""))

  /** tr_lower variant (normalize_part.py:6-7, clean_and_parse.py:34-40):
    * İ->i, I->ı — the convention clean_text uses. */
  def trLower(c: Column): Column =
    regexp_replace(lower(translate(c, "İI", "iı")), "̇", "")

  /** Diacritic folding (normalize.py:61-79), config-gated in the
    * reference (default off). */
  def foldDiacritics(c: Column): Column =
    translate(c, "çğışöüÇĞİÖŞÜ", "cgisouCGIOSU")

  /** _strip_punct_but_keep_separators (normalize_and_parse.py:46-52):
    * kill `.`/`,` between non-digits (keeps `10/3`-style values),
    * `;:|` runs -> space. Order matters. */
  def stripPunctKeepSeparators(c: Column): Column = {
    val s1 = regexp_replace(c, "(?U)(?<=\\D)[\\.,](?=\\D)", " ")
    val s2 = regexp_replace(s1, "(?U)(?<=\\D)[\\.,](?=\\d)", " ")
    val s3 = regexp_replace(s2, "(?U)(?<=\\d)[,](?=\\D)", " ")
    regexp_replace(s3, "[;:|]+", " ")
  }

  /** ABBR table (normalize_and_parse.py:11-32) — applied in insertion
    * order; several replacements carry a trailing space by design. */
  val abbr: Seq[(String, String)] = Seq(
    ("(?U)\\bmah\\.?\\b", "mahalle"),
    ("(?U)\\bmahallesi\\b", "mahalle"),
    ("(?U)\\bmh\\.?\\b", "mahalle"),
    ("(?U)\\bcad\\.?\\b", "cadde"),
    ("(?U)\\bcaddesi\\b", "cadde"),
    ("(?U)\\bcd\\.?\\b", "cadde"),
    ("(?U)\\bsok\\.?\\b", "sokak"),
    ("(?U)\\bsokağı\\b", "sokak"),
    ("(?U)\\bsk\\.?\\b", "sokak"),
    ("(?U)\\bbulv?\\.?\\b", "bulvar"),
    ("(?U)\\bbulvarı\\b", "bulvar"),
    ("(?U)\\bno:?", "no "),
    ("(?U)\\bkapı no:?", "no "),
    ("(?U)\\bd[.:]\\b", "daire "),
    ("(?U)\\bdaire:?", "daire "),
    ("(?U)\\bk:?", "kat "),
    ("(?U)\\bkat:?", "kat "),
    ("(?U)\\bapt\\.?\\b", "apartman"),
    ("(?U)\\bap\\b", "apartman"),
    ("(?U)\\bmevkii\\b", "mevkii"))

  /** clean_text (normalize_and_parse.py:55-77): the exact reference
    * normalization used by run_normalize / make_submission /
    * baseline_submission. */
  def cleanText(c: Column): Column = {
    val lowered = trLower(coalesce(c, lit("")))
    val sep = stripPunctKeepSeparators(lowered)
    val expanded = abbr.foldLeft(sep) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    // 'd 1' -> 'daire 1' (only d + number; "doria" untouched)
    val dnum = regexp_replace(expanded, "(?U)\\bd\\s+(?=\\d)", "daire ")
    // no:15 / no15 / no-15 -> no 15
    val nonum = regexp_replace(dnum, "(?U)\\bno\\s*[:\\-]?\\s*(\\d+)", "no $1")
    // 864.sokak -> 864 sokak
    val numdot = regexp_replace(nonum, "(?U)(\\d+)\\.(sokak|cadde|mahalle)\\b", "$1 $2")
    // non-numeric slash gets spaces; 10/3 survives
    val slash = regexp_replace(numdot, "(?<!\\d)/(?!\\d)", " / ")
    trim(regexp_replace(slash, "\\s+", " "))
  }

  /** The generic config-driven chain (normalize.py:85-136) with the
    * shipped defaults: tr_safe_lower + optional diacritic folding +
    * regex rules + literal replaces + word-bounded abbreviations +
    * stopword removal + optional punctuation strip + space collapse.
    * Mirrors `normalize_text`'s step order exactly. */
  def normalizeText(
      c: Column,
      regexRules: Seq[(String, String)] = Nil,
      literalReplace: Seq[(String, String)] = Nil,
      abbreviations: Seq[(String, String)] = Nil,
      stopwords: Seq[String] = Nil,
      lowercase: Boolean = true,
      foldDiacriticsOn: Boolean = false,
      stripPunctuation: Boolean = false,
      stripExtraSpaces: Boolean = true): Column = {
    var x = coalesce(c, lit(""))
    if (lowercase) x = trSafeLower(x)
    if (foldDiacriticsOn) x = foldDiacritics(x)
    x = regexRules.foldLeft(x) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
    x = literalReplace.foldLeft(x) { case (acc, (k, v)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(k), // literal str.replace
        java.util.regex.Matcher.quoteReplacement(v))
    }
    x = abbreviations.foldLeft(x) { case (acc, (src, tgt)) =>
      regexp_replace(acc, s"(?U)\\b${java.util.regex.Pattern.quote(src)}\\b",
        java.util.regex.Matcher.quoteReplacement(tgt))
    }
    if (stopwords.nonEmpty)
      x = array_join(
        filter(split(x, "\\s+"), t => !t.isin(stopwords.map(lit(_)): _*) && t =!= ""),
        " ")
    if (stripPunctuation) x = regexp_replace(x, "(?U)[^\\w\\s]", " ")
    if (stripExtraSpaces)
      x = array_join(filter(split(x, "\\s+"), t => t =!= ""), " ")
    x
  }

  /** Mojibake repair (normalize.py:49-58), config-gated (default off) —
    * the one transform that genuinely needs imperative code (latin1
    * re-decode attempt with fallback). */
  private val unmojibake = udf { (s: String) =>
    if (s == null) null
    else if (s.contains('Ã') || s.contains('Ä') || s.contains('Å')) {
      try new String(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Throwable => s }
    } else s
  }
  def fixMojibake(c: Column): Column = unmojibake(c)
}

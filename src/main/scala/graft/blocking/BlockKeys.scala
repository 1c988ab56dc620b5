package graft.blocking

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Blocking-key derivation — Spark rebuild of
  * `/root/reference/addresskit/matching/blocking.py:7-52`
  * (`make_block_key`). Modes:
  *
  *   - `prefixN`          : first N chars of the alnum-only lowered text
  *   - `digits+prefixN`   : first digit run + "|" + prefixN
  *   - `province+district`: field-pair key with prefix8 fallback
  *   - `""` (default)     : single bucket — no blocking
  *
  * The reference builds a `dict[key -> list[row]]` (blocking.py:55-60);
  * here the key is just a derived column and the "index" is the shuffle
  * of the subsequent equi-join on it — the distributed equivalent, with
  * no driver-side materialization.
  *
  * The reference keeps Turkish letters in its alnum class
  * (`[^a-z0-9ğüşöçıİ]`, blocking.py:8-10); the graft normal form is
  * ascii-only so `[^a-z0-9]` is equivalent on our data and stays
  * RE2/DuckDB-portable. [[graft.normalize.ReferenceNormalizer]] covers
  * the Turkish-parity path.
  */
object BlockKeys {

  private val NotAlnum = "[^a-z0-9]"

  def alnumLower(c: Column): Column = regexp_replace(lower(c), NotAlnum, "")

  def firstDigits(c: Column): Column = regexp_extract(c, "[0-9]+", 0)

  /** blocking.py:24-27 — `prefixN`. */
  def prefixKey(c: Column, n: Int): Column = substring(alnumLower(c), 1, n)

  /** blocking.py:29-31 — `digits+prefixN` (the reference's configured
    * mode, configs/match.yaml:14). */
  def digitsPrefixKey(c: Column, n: Int): Column =
    concat(firstDigits(c), lit("|"), prefixKey(c, n))

  /** blocking.py:33-48 — `province+district` with prefix8 fallback. */
  def fieldPairKey(a: Column, b: Column, text: Column): Column = {
    val va = trim(lower(coalesce(a, lit(""))))
    val vb = trim(lower(coalesce(b, lit(""))))
    when(va =!= "" || vb =!= "", concat(va, lit("|"), vb))
      .otherwise(prefixKey(text, 8))
  }

  /** Mode dispatcher mirroring make_block_key's string protocol. */
  def blockKey(text: Column, mode: String): Column = {
    val m = Option(mode).getOrElse("").toLowerCase.trim
    if (m.startsWith("digits+prefix"))
      digitsPrefixKey(text, m.replaceAll("\\D", "").toInt)
    else if (m.startsWith("prefix"))
      prefixKey(text, m.replaceAll("\\D", "").toInt)
    else if (m == "phonetic") phoneticKey(text)
    else lit("") // no blocking -> single bucket (blocking.py:51-52)
  }

  // Phonetic blocking (J36) ---------------------------------------------

  private val SdxFrom = "bfpvcgjkqsxzdtlmnraeiouy"
  private val SdxTo   = "111122222222334556000000"
  private val SdxCoded = "[bfpvcgjkqsxzdtlmnr]"

  /** Classic American Soundex of the text's first alphabetic run — the
    * phonetic blocking key (J36): spelling variants that SOUND alike
    * land in the same block, the complement of prefix keys (blind past
    * the first divergent letter) and LSH bands (need shared shingles).
    *
    * Implemented as a portable expression chain rather than Spark's
    * native `soundex()` so the DuckDB mirror is the IDENTICAL
    * computation (DuckDB has no soundex; engine-native variants differ
    * on the h/w rule):
    *
    *   1. `tok`  = first `[a-z]+` run of the lowered text
    *   2. drop h/w everywhere (the "same code separated by h/w counts
    *      once" rule: removal before collapsing implements it exactly)
    *   3. translate consonants → digit groups 1-6, vowels+y → 0
    *      (vowels SEPARATE: a 0 between equal digits blocks collapse)
    *   4. collapse runs of each digit 1-6 (RE2-safe: one replace per
    *      digit — no pattern backreferences)
    *   5. drop the 0s, drop the leading group iff the first letter is
    *      a coded consonant (its code is by construction the head
    *      group; vowel/h/w heads contribute no group)
    *   6. first letter uppercased + next 3 codes, 0-padded to 4
    *
    * Empty/alphabet-free text → empty key (single "no evidence"
    * bucket, same convention as the other modes on empty text). */
  def phoneticKey(c: Column): Column = {
    val tok = regexp_extract(lower(c), "[a-z]+", 0)
    val t2 = translate(regexp_replace(tok, "[hw]", ""), SdxFrom, SdxTo)
    val collapsed = (1 to 6).foldLeft(t2) { (acc, d) =>
      regexp_replace(acc, s"$d{2,}", d.toString)
    }
    val t4 = regexp_replace(collapsed, "0", "")
    val c1 = substring(tok, 1, 1)
    val rest = when(c1.rlike(SdxCoded), substring(t4, 2, 3))
      .otherwise(substring(t4, 1, 3))
    when(tok === "", lit("")).otherwise(rpad(concat(upper(c1), rest), 4, "0"))
  }

  // DuckDB mirrors -------------------------------------------------------

  def prefixKeySqlDuck(e: String, n: Int): String =
    s"substring(regexp_replace(lower($e), '$NotAlnum', '', 'g'), 1, $n)"

  def digitsPrefixKeySqlDuck(e: String, n: Int): String =
    s"(coalesce(regexp_extract($e, '[0-9]+', 0), '') || '|' || ${prefixKeySqlDuck(e, n)})"

  /** Mirror of [[phoneticKey]] — the identical chain, step for step. */
  def phoneticKeySqlDuck(e: String): String = {
    val tok = s"regexp_extract(lower($e), '[a-z]+', 0)"
    val t2 = s"translate(regexp_replace($tok, '[hw]', '', 'g'), '$SdxFrom', '$SdxTo')"
    val collapsed = (1 to 6).foldLeft(t2) { (acc, d) =>
      s"regexp_replace($acc, '$d{2,}', '$d', 'g')"
    }
    val t4 = s"regexp_replace($collapsed, '0', '', 'g')"
    val c1 = s"substring($tok, 1, 1)"
    val rest = s"CASE WHEN regexp_matches($c1, '$SdxCoded') " +
      s"THEN substring($t4, 2, 3) ELSE substring($t4, 1, 3) END"
    s"CASE WHEN $tok = '' THEN '' " +
      s"ELSE rpad(upper($c1) || ($rest), 4, '0') END"
  }
}

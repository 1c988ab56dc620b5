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
    else lit("") // no blocking -> single bucket (blocking.py:51-52)
  }

  // DuckDB mirrors -------------------------------------------------------

  def prefixKeySqlDuck(e: String, n: Int): String =
    s"substring(regexp_replace(lower($e), '$NotAlnum', '', 'g'), 1, $n)"

  def digitsPrefixKeySqlDuck(e: String, n: Int): String =
    s"(coalesce(regexp_extract($e, '[0-9]+', 0), '') || '|' || ${prefixKeySqlDuck(e, n)})"
}

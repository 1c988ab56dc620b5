package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text + tool-name canonicalization for the transcript graft — the
  * Spark-native rebuild of the reference's normalize stage
  * (`/root/reference/addresskit/normalize.py:85-136`,
  * `configs/normalize.yaml`). The whole chain is pure Column
  * expressions folded in rule order (the reference applies its YAML
  * rules sequentially), so Catalyst constant-folds the rule literals and
  * whole-stage codegen fuses the chain into the scan — no UDFs.
  *
  * Two chains live here:
  *   - [[normalize]]: the graft chain for transcript text. Uses only
  *     constructs with identical semantics in DuckDB (`lower`, literal
  *     `replace`, RE2-safe `regexp_replace`), so the driver's DuckDB
  *     oracle can mirror it exactly ([[normalizeSqlDuck]]).
  *   - [[graft.normalize.ReferenceNormalizer]]: full-fidelity port of the
  *     reference's Turkish address chain (P1-P13), Java-regex features
  *     allowed, verified by golden pairs instead of SQL oracles.
  */
object Normalizer {

  /** Abbreviation table (graft analogue of ABBR_MAP
    * normalize_part.py:10-25): dirty token -> canonical. Patterns are
    * word-bounded, optionally dot-suffixed, like the reference's
    * `\b<abbr>\b` expansion (normalize.py:117-121). */
  val abbreviations: Seq[(String, String)] = Seq(
    ("mrg", "merge"), ("wnd", "window"), ("strm", "stream"), ("cust", "customer"))

  /** The graft normalize chain:
    *  1. lowercase (normalize.py:95-96)
    *  2. abbreviation expansion with word boundaries (normalize.py:117-121)
    *  3. punctuation -> space (strip_punctuation, normalize.py:129-130)
    *  4. whitespace collapse + trim (normalize.py:132-134)
    *
    * r06: executed by the fused single-pass [[TextNormalize]]
    * expression — the 6-regex Column chain below measured ~2.4 ms/doc
    * on the bench transcript corpus (~90 of the tsr query's ~105
    * CPU-seconds). Output is property-tested identical
    * (NormalizeExpressionsSpec) and the DuckDB mirror
    * ([[normalizeSqlDuck]]) is untouched, so every oracle hash is
    * unchanged. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      TextNormalize(org.apache.spark.sql.GraftShim.expression(c)))

  /** The original Column-chain formulation of [[normalize]] — the
    * executable spec the fused expression is property-tested against
    * (and the exact shape [[normalizeSqlDuck]] mirrors in DuckDB). */
  private[graft] def normalizeColumnChain(c: Column): Column = {
    val lowered = lower(c)
    val expanded = abbreviations.foldLeft(lowered) { case (acc, (abbr, full)) =>
      regexp_replace(acc, s"\\b$abbr\\b\\.?", full)
    }
    val noPunct = regexp_replace(expanded, "[^a-z0-9 ]", " ")
    trim(regexp_replace(noPunct, " +", " "))
  }

  /** DuckDB mirror of [[normalize]] over a SQL expression string.
    * RE2 regexes with the 'g' flag match Spark's replace-all default. */
  def normalizeSqlDuck(e: String): String = {
    val lowered = s"lower($e)"
    val expanded = abbreviations.foldLeft(lowered) { case (acc, (abbr, full)) =>
      s"regexp_replace($acc, '\\b$abbr\\b\\.?', '$full', 'g')"
    }
    val noPunct = s"regexp_replace($expanded, '[^a-z0-9 ]', ' ', 'g')"
    s"trim(regexp_replace($noPunct, ' +', ' ', 'g'))"
  }

  /** Tool-name canonicalization — the graft analogue of the reference's
    * abbreviation table applied to the `tool` column: lowercase, any
    * punctuation/space run -> single underscore. Maps every dirty
    * spelling in [[graft.transcripts.Transcripts.toolSpellings]] to its
    * canonical name. */
  def normTool(c: Column): Column =
    when(c.isNull, null).otherwise(
      regexp_replace(lower(c), "[^a-z0-9]+", "_"))

  def normToolSqlDuck(e: String): String =
    s"CASE WHEN $e IS NULL THEN NULL ELSE regexp_replace(lower($e), '[^a-z0-9]+', '_', 'g') END"

  // ---------------------------------------------------------------------
  // Address chain (reference semantics, RE2-portable formulation)
  // ---------------------------------------------------------------------

  /** Address abbreviation table — the `expand_abbr` config
    * (configs/match.yaml + ABBR normalize_and_parse.py:11-32), ascii
    * canonical subset. Applied after punctuation spacing, so `mah.`/`sk.`
    * arrive as bare `mah`/`sk` tokens. */
  val addressAbbr: Seq[(String, String)] = Seq(
    ("mahallesi", "mahalle"), ("mah", "mahalle"), ("mh", "mahalle"),
    ("caddesi", "cadde"), ("cad", "cadde"), ("cd", "cadde"),
    ("sokagi", "sokak"), ("sok", "sokak"), ("sk", "sokak"),
    ("bulv", "bulvar"), ("blv", "bulvar"),
    ("apt", "apartman"))

  /** The reference normalize chain for addresses
    * (normalize_and_parse.py `clean_text`, P1/P10-P13 + ABBR), restated
    * without lookarounds so the exact same semantics run under both Java
    * regex (Spark) and RE2 (DuckDB oracle):
    *
    *  1. lowercase (tr_safe_lower's ascii projection)
    *  2. punctuation after a letter -> space (`mah.` -> `mah `,
    *     `no:12` -> `no 12`, covering RE_NO/daire/kat spacing)
    *  3. non-numeric slash -> space (`kadikoy/istanbul` splits,
    *     numeric `12/3` survives — normalize_and_parse.py:73-74)
    *  4. word-bounded abbreviation expansion (ABBR table)
    *  5. `d <num>` -> `daire <num>`, `k <num>` -> `kat <num>`
    *     (normalize_and_parse.py:66-68)
    *  6. whitespace collapse + trim
    */
  def normalizeAddress(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      AddressNormalize(org.apache.spark.sql.GraftShim.expression(c)))

  /** The original 16-regex Column chain of [[normalizeAddress]] — the
    * executable spec [[AddressNormalize]] is property-tested against
    * (r06; the DuckDB mirror below is untouched). */
  private[graft] def normalizeAddressColumnChain(c: Column): Column = {
    val lowered = lower(c)
    val punct = regexp_replace(lowered, "([a-z])[.,:;]", "$1 ")
    val slash1 = regexp_replace(punct, "([a-z])/", "$1 ")
    val slash2 = regexp_replace(slash1, "/([a-z])", " $1")
    val expanded = addressAbbr.foldLeft(slash2) { case (acc, (abbr, full)) =>
      regexp_replace(acc, s"\\b$abbr\\b", full)
    }
    val dnum = regexp_replace(expanded, "\\bd ([0-9])", "daire $1")
    val knum = regexp_replace(dnum, "\\bk ([0-9])", "kat $1")
    trim(regexp_replace(knum, " +", " "))
  }

  /** DuckDB mirror of [[normalizeAddress]]. */
  def normalizeAddressSqlDuck(e: String): String = {
    val lowered = s"lower($e)"
    val punct = s"regexp_replace($lowered, '([a-z])[.,:;]', '\\1 ', 'g')"
    val slash1 = s"regexp_replace($punct, '([a-z])/', '\\1 ', 'g')"
    val slash2 = s"regexp_replace($slash1, '/([a-z])', ' \\1', 'g')"
    val expanded = addressAbbr.foldLeft(slash2) { case (acc, (abbr, full)) =>
      s"regexp_replace($acc, '\\b$abbr\\b', '$full', 'g')"
    }
    val dnum = s"regexp_replace($expanded, '\\bd ([0-9])', 'daire \\1', 'g')"
    val knum = s"regexp_replace($dnum, '\\bk ([0-9])', 'kat \\1', 'g')"
    s"trim(regexp_replace($knum, ' +', ' ', 'g'))"
  }
}

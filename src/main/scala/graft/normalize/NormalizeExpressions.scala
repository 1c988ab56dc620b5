package graft.normalize

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass replacements for the two normalize chains
  * (r06, guide §1.2 "per-task work"). The regex chains are semantically
  * FROZEN (both are mirrored in DuckDB oracle SQL), but their cost was
  * the single largest per-row expense in the bench suite: the graft
  * chain (6 `regexp_replace` passes) measured ~2.4 ms/doc on the
  * 12-variant transcript corpus — ~90 CPU-seconds of the tsr query's
  * ~105, dwarfing the join it feeds — and the address chain stacks 16
  * regex passes per row. Each fused expression walks the bytes once
  * (a few µs/doc) and is property-tested equal to the exact Column
  * chain it replaces ([[Normalizer.normalizeColumnChain]] /
  * [[Normalizer.normalizeAddressColumnChain]] stay available as the
  * test oracles; the DuckDB SQL mirrors are untouched).
  *
  * Exactness strategy: the fast path only runs for ALL-ASCII input
  * (every byte >= 0); anything else falls back to a literal Java
  * re-execution of the chain (`UTF8String.toLowerCase` +
  * `java.util.regex` with the same patterns/replacements — exactly
  * what Spark's `lower`/`regexp_replace` do). The fast path reproduces
  * the sequential replaceAll semantics, including the one genuinely
  * order-sensitive interaction in the graft chain: `\bX\b\.?`
  * replacement consumes a following dot, which MERGES the adjacent
  * word run for all LATER patterns (e.g. `"mrg.wnd"` → pass 1 yields
  * `"mergewnd"`, so pass 2 must NOT see a `wnd` token) while leaving
  * EARLIER patterns' matches intact (e.g. `"cust.mrg"` → `mrg` was
  * already replaced in pass 1 when the dot still separated the runs,
  * so the result is `"customermerge"`). See the blocked-run rule in
  * [[NormalizeOps.normalizeGraft]].
  */
object NormalizeOps {

  // -- shared byte helpers -------------------------------------------------

  @inline private def lowerB(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  @inline private def isWordB(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  @inline private def isLetterB(b: Byte): Boolean = b >= 'a' && b <= 'z'

  @inline private def isDigitB(b: Byte): Boolean = b >= '0' && b <= '9'

  private def allAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  // -- graft transcript chain ---------------------------------------------

  private val graftKeys: Array[Array[Byte]] =
    Normalizer.abbreviations.map(_._1.getBytes("US-ASCII")).toArray
  private val graftReps: Array[Array[Byte]] =
    Normalizer.abbreviations.map(_._2.getBytes("US-ASCII")).toArray

  // exact fallback: the same operations Spark's lower/regexp_replace run
  private val graftAbbrevP = Normalizer.abbreviations.map { case (k, v) =>
    (java.util.regex.Pattern.compile("\\b" + k + "\\b\\.?"), v)
  }
  private val graftPunctP = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val spacesP = java.util.regex.Pattern.compile(" +")

  private def normalizeGraftFallback(s: UTF8String): UTF8String = {
    var t = s.toLowerCase.toString
    graftAbbrevP.foreach { case (p, v) => t = p.matcher(t).replaceAll(v) }
    t = graftPunctP.matcher(t).replaceAll(" ")
    t = spacesP.matcher(t).replaceAll(" ")
    UTF8String.fromString(t).trim()
  }

  /** `trim(regexp_replace(regexp_replace(abbrev₄(abbrev₃(abbrev₂(
    * abbrev₁(lower(c))))), "[^a-z0-9 ]", " "), " +", " "))` with
    * abbrevᵢ = `\bkᵢ\b\.?` → repᵢ, in ONE pass over ASCII bytes.
    *
    * Key facts making the fusion exact (ASCII; each verified in
    * NormalizeExpressionsSpec against the real chain):
    *   - `\bk\b` matches iff a MAXIMAL word run ([a-z0-9_]+ post-lower)
    *     equals k, so matching is a per-run equality test;
    *   - a replacement that consumes the following `.` glues its word
    *     onto the next run; boundaries are only ever DESTROYED by this
    *     (replacements end in word chars and never touch other
    *     separators), so the only cross-pass effect is: the run right
    *     after a consumed dot stops matching patterns that run in
    *     LATER passes than the replacement that consumed the dot
    *     (`ki > adjKey` below) — earlier/equal passes already matched
    *     while the dot was still a boundary;
    *   - the final punct pass maps every non-[a-z0-9 ] char (incl. '_'
    *     and any unconsumed '.') to a space, and spaces collapse+trim,
    *     so emission reduces to word bytes + a pending-single-space
    *     flag. */
  def normalizeGraft(s: UTF8String): UTF8String = {
    if (!allAscii(s)) return normalizeGraftFallback(s)
    val n = s.numBytes()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](2 * n + 8)
    var pos = 0
    var pending = false // >=1 separator chars seen since last emission
    var i = 0
    var adjKey = -1 // key idx whose replacement consumed the dot ending right before position i
    while (i < n) {
      val b = lowerB(s.getByte(i))
      if (isWordB(b)) {
        val start = i
        i += 1
        while (i < n && isWordB(lowerB(s.getByte(i)))) i += 1
        val runLen = i - start
        // which abbreviation key equals this (lowered) run, if any
        var ki = -1
        var k = 0
        while (ki < 0 && k < graftKeys.length) {
          val key = graftKeys(k)
          if (key.length == runLen) {
            var j = 0
            while (j < runLen && lowerB(s.getByte(start + j)) == key(j)) j += 1
            if (j == runLen) ki = k
          }
          k += 1
        }
        // blocked: this run was glued to the previous replacement by a
        // consumed dot, and this key's pass runs AFTER that replacement's
        if (ki >= 0 && adjKey >= 0 && ki > adjKey) ki = -1
        adjKey = -1
        if (ki >= 0) {
          if (pending && pos > 0) { out(pos) = ' '; pos += 1 }
          pending = false
          val rep = graftReps(ki)
          System.arraycopy(rep, 0, out, pos, rep.length)
          pos += rep.length
          if (i < n && s.getByte(i) == '.') { i += 1; adjKey = ki }
        } else {
          // raw run; '_' is stripped to (collapsed) space by the punct pass
          var j = start
          while (j < i) {
            val c = lowerB(s.getByte(j))
            if (c == '_') pending = true
            else {
              if (pending && pos > 0) { out(pos) = ' '; pos += 1 }
              pending = false
              out(pos) = c
              pos += 1
            }
            j += 1
          }
        }
      } else {
        // separator/punct (any non-word char): becomes a collapsed space
        pending = true
        adjKey = -1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, pos)
  }

  // -- address chain -------------------------------------------------------

  private val addrKeys: Array[Array[Byte]] =
    Normalizer.addressAbbr.map(_._1.getBytes("US-ASCII")).toArray
  private val addrReps: Array[Array[Byte]] =
    Normalizer.addressAbbr.map(_._2.getBytes("US-ASCII")).toArray
  private val daireRep = "daire".getBytes("US-ASCII")
  private val katRep = "kat".getBytes("US-ASCII")

  private val addrPunctP = java.util.regex.Pattern.compile("([a-z])[.,:;]")
  private val addrSlash1P = java.util.regex.Pattern.compile("([a-z])/")
  private val addrSlash2P = java.util.regex.Pattern.compile("/([a-z])")
  private val addrAbbrevP = Normalizer.addressAbbr.map { case (k, v) =>
    (java.util.regex.Pattern.compile("\\b" + k + "\\b"), v)
  }
  private val addrDnumP = java.util.regex.Pattern.compile("\\bd ([0-9])")
  private val addrKnumP = java.util.regex.Pattern.compile("\\bk ([0-9])")

  private def normalizeAddressFallback(s: UTF8String): UTF8String = {
    var t = s.toLowerCase.toString
    t = addrPunctP.matcher(t).replaceAll("$1 ")
    t = addrSlash1P.matcher(t).replaceAll("$1 ")
    t = addrSlash2P.matcher(t).replaceAll(" $1")
    addrAbbrevP.foreach { case (p, v) => t = p.matcher(t).replaceAll(v) }
    t = addrDnumP.matcher(t).replaceAll("daire $1")
    t = addrKnumP.matcher(t).replaceAll("kat $1")
    t = spacesP.matcher(t).replaceAll(" ")
    UTF8String.fromString(t).trim()
  }

  /** [[Normalizer.normalizeAddress]]'s 16-regex chain in two passes.
    *
    * Pass 1 (in place, length-preserving): lowercase + the three
    * char-local rules — `([a-z])[.,:;]` → `$1·`, `([a-z])/` → `$1·`,
    * `/([a-z])` → `·$1`. Every replacement writes only a space over
    * the punct/slash position, and the letter-ness of neighbors never
    * changes, so a left-to-right scan with direct neighbor tests is
    * exactly the three sequential replaceAlls.
    *
    * Pass 2 (token scan): the 12 `\bk\b` → rep abbreviations are a pure
    * per-run map (no replacement equals or contains another key as a
    * full run, and no dots are consumed, so sequential == simultaneous);
    * `\bd ([0-9])` / `\bk ([0-9])` rewrite a single-letter run whose
    * lookahead is exactly one space + digit (the space and digit flow
    * through unchanged, matching the `$1` backreference). Unlike the
    * graft chain there is NO general punct strip: every non-space char
    * outside a replaced run is emitted verbatim, only runs of ' '
    * collapse, and the trim drops leading/trailing spaces only. */
  def normalizeAddress(s: UTF8String): UTF8String = {
    if (!allAscii(s)) return normalizeAddressFallback(s)
    val n = s.numBytes()
    if (n == 0) return UTF8String.EMPTY_UTF8
    // pass 1: lower + char-local punct/slash spacing (length-preserving)
    val buf = new Array[Byte](n)
    var i = 0
    while (i < n) { buf(i) = lowerB(s.getByte(i)); i += 1 }
    i = 0
    while (i < n) {
      val b = buf(i)
      if ((b == '.' || b == ',' || b == ':' || b == ';') &&
          i > 0 && isLetterB(buf(i - 1))) {
        buf(i) = ' '
      } else if (b == '/') {
        if (i > 0 && isLetterB(buf(i - 1))) buf(i) = ' '
        else if (i + 1 < n && isLetterB(buf(i + 1))) buf(i) = ' '
      }
      i += 1
    }
    // pass 2: abbrev/daire/kat token map + space collapse + trim
    val out = new Array[Byte](4 * n + 8)
    var pos = 0
    var pending = false
    i = 0
    while (i < n) {
      val b = buf(i)
      if (isWordB(b)) {
        val start = i
        i += 1
        while (i < n && isWordB(buf(i))) i += 1
        val runLen = i - start
        var rep: Array[Byte] = null
        var k = 0
        while (rep == null && k < addrKeys.length) {
          val key = addrKeys(k)
          if (key.length == runLen) {
            var j = 0
            while (j < runLen && buf(start + j) == key(j)) j += 1
            if (j == runLen) rep = addrReps(k)
          }
          k += 1
        }
        if (rep == null && runLen == 1 && i + 1 < n && buf(i) == ' ' &&
            isDigitB(buf(i + 1))) {
          if (buf(start) == 'd') rep = daireRep
          else if (buf(start) == 'k') rep = katRep
        }
        if (pending && pos > 0) { out(pos) = ' '; pos += 1 }
        pending = false
        if (rep != null) {
          System.arraycopy(rep, 0, out, pos, rep.length)
          pos += rep.length
        } else {
          System.arraycopy(buf, start, out, pos, runLen)
          pos += runLen
        }
      } else if (b == ' ') {
        pending = true
        i += 1
      } else {
        // non-space separator (remaining '.', '-', tabs, ...): verbatim
        if (pending && pos > 0) { out(pos) = ' '; pos += 1 }
        pending = false
        out(pos) = b
        pos += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, pos)
  }
}

/** `Normalizer.normalize` as one codegen'd pass — see
  * [[NormalizeOps.normalizeGraft]]. */
case class TextNormalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.normalizeGraft(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.normalize.NormalizeOps.normalizeGraft($c)")
  override def prettyName: String = "graft_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Normalizer.normalizeAddress` as a fused pass — see
  * [[NormalizeOps.normalizeAddress]]. */
case class AddressNormalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.normalizeAddress(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.normalize.NormalizeOps.normalizeAddress($c)")
  override def prettyName: String = "graft_normalize_address"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

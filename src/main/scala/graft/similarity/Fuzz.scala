package graft.similarity

import scala.collection.mutable

/** Pure-Scala reimplementation of the rapidfuzz scorer semantics the
  * reference relies on (`/root/reference/addresskit/match.py:109-115`):
  * `ratio`, `partial_ratio`, `token_set_ratio` (plus `token_sort_ratio`
  * and Jaro-Winkler, named by the project north star). All scores are on
  * the 0..100 scale, like rapidfuzz.
  *
  * `ratio` is the normalized **indel** similarity
  * (`100 * 2*LCS(a,b) / (|a|+|b|)`), NOT a Levenshtein-substitution
  * ratio. LCS length is computed with the Allison–Dix bit-parallel
  * algorithm — O(ceil(m/64) * n) word ops — so scoring stays cheap for
  * the multi-hundred-character concatenated transcript texts this engine
  * scores inside the block join.
  *
  * These functions are called from codegen'd Catalyst expressions (see
  * [[Expressions]]); keep them static-dispatch, allocation-light and
  * free of closures.
  */
object Fuzz {

  /** Longest-common-subsequence length, bit-parallel (Allison–Dix).
    * Works on UTF-16 chars; inputs here are BMP-only (ASCII + Turkish).
    */
  def lcsLength(a: CharSequence, b: CharSequence): Int = {
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0
    // Ensure the bit-vectors cover the *shorter* string: fewer words.
    if (m > n) return lcsLength(b, a)
    val words = (m + 63) >>> 6
    // Pattern-match bitmasks for each distinct char of `a`.
    val pm = new mutable.HashMap[Char, Array[Long]]()
    var i = 0
    while (i < m) {
      val c = a.charAt(i)
      val arr = pm.getOrElseUpdate(c, new Array[Long](words))
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val r = new Array[Long](words) // bit i set => LCS row increased at i
    val x = new Array[Long](words)
    var j = 0
    while (j < n) {
      val mask = pm.getOrElse(b.charAt(j), null)
      if (mask != null) {
        // X = PM | R ; Y = X - ((R << 1) | 1) ; R = X & ~Y
        var carryIn = 1L // the "| 1" of (R << 1) | 1
        var borrow = 0L
        var w = 0
        while (w < words) {
          val xw = mask(w) | r(w)
          x(w) = xw
          // shifted = (R << 1) | carry across words
          val shifted = (r(w) << 1) | carryIn
          carryIn = r(w) >>> 63
          // y = xw - shifted - borrow  (unsigned, with borrow out)
          val d1 = xw - shifted
          val b1 = if (java.lang.Long.compareUnsigned(xw, shifted) < 0) 1L else 0L
          val d2 = d1 - borrow
          val b2 = if (borrow == 1L && d1 == 0L) 1L else 0L
          borrow = b1 | b2
          r(w) = xw & ~d2
          w += 1
        }
      }
      j += 1
    }
    var count = 0
    var w = 0
    while (w < words) { count += java.lang.Long.bitCount(r(w)); w += 1 }
    count
  }

  /** Indel distance = insertions + deletions to turn `a` into `b`. */
  def indelDistance(a: CharSequence, b: CharSequence): Int =
    a.length + b.length - 2 * lcsLength(a, b)

  /** rapidfuzz `fuzz.ratio`: 100 * (1 - indel/(|a|+|b|)); 100 for two
    * empty strings (rapidfuzz convention). */
  def ratio(a: CharSequence, b: CharSequence): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else 100.0 * (1.0 - indelDistance(a, b).toDouble / total)
  }

  /** rapidfuzz `fuzz.partial_ratio` semantics: best `ratio` of the
    * shorter string against any window of the longer one (full-length
    * windows plus the shrinking suffix windows). */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    val sl = s.length
    var best = 0.0
    var i = 0
    while (i < l.length && best < 100.0) {
      val end = math.min(i + sl, l.length)
      val sc = ratio(s, l.subSequence(i, end))
      if (sc > best) best = sc
      i += 1
    }
    best
  }

  private def splitTokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** rapidfuzz `fuzz.token_sort_ratio`: ratio over whitespace-tokenized,
    * lexicographically sorted, space-rejoined strings. */
  def tokenSortRatio(a: String, b: String): Double = {
    val sa = splitTokens(a).sorted.mkString(" ")
    val sb = splitTokens(b).sorted.mkString(" ")
    ratio(sa, sb)
  }

  /** rapidfuzz `fuzz.token_set_ratio`. Tokenize on whitespace into
    * *sets*; with `sect` = sorted-joined intersection and `ab`/`ba` the
    * sorted-joined set differences, the score is
    * `max(ratio(sect+ab, sect+ba), ratio(sect, sect+ab), ratio(sect, sect+ba))`
    * — computed in closed form for the two prefix cases, with the
    * fast-path 100 when one token set contains the other (non-empty
    * intersection). Mirrors rapidfuzz's C++ `token_set_ratio`.
    */
  def tokenSetRatio(a: String, b: String): Double = {
    val ta = splitTokens(a).toSet
    val tb = splitTokens(b).toSet
    val sect = ta.intersect(tb)
    val diffAb = ta.diff(tb)
    val diffBa = tb.diff(ta)
    if (sect.nonEmpty && (diffAb.isEmpty || diffBa.isEmpty)) return 100.0
    val abJoined = diffAb.toArray.sorted.mkString(" ")
    val baJoined = diffBa.toArray.sorted.mkString(" ")
    val sectLen = if (sect.isEmpty) 0 else sect.toArray.map(_.length).sum + sect.size - 1
    val sectSep = if (sectLen > 0) 1 else 0
    val sectAbLen = sectLen + (if (abJoined.isEmpty) 0 else sectSep + abJoined.length)
    val sectBaLen = sectLen + (if (baJoined.isEmpty) 0 else sectSep + baJoined.length)
    // ratio(sect+" "+ab, sect+" "+ba): shared prefix contributes no edits
    val dist = indelDistance(abJoined, baJoined) // suffix-only edits
    val denom = sectAbLen + sectBaLen
    var best = if (denom == 0) 100.0 else 100.0 * (1.0 - dist.toDouble / denom)
    if (sectLen > 0) {
      val r1 = 100.0 * (1.0 - (sectAbLen - sectLen).toDouble / (sectLen + sectAbLen))
      val r2 = 100.0 * (1.0 - (sectBaLen - sectLen).toDouble / (sectLen + sectBaLen))
      if (r1 > best) best = r1
      if (r2 > best) best = r2
    }
    best
  }

  /** Jaro similarity on 0..1. Standard definition: matches within a
    * window of floor(max(|a|,|b|)/2)-1, transpositions counted over the
    * matched sequences. Operates on UTF-8 **bytes**, matching DuckDB's
    * `jaro_similarity` (our oracle); identical to codepoint semantics on
    * ASCII input. */
  def jaro(a: String, b: String): Double =
    jaroBytes(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    // Either side empty => 0.0 (DuckDB `jaro_similarity` convention, so
    // our DuckDB oracle SQL agrees bit-for-bit).
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = floor(mismatches / 2) — integer division, matching
    // the rapidfuzz/DuckDB C++ implementations (`CommonChars - Transpositions/2`
    // in size_t arithmetic), so odd mismatch counts round down.
    (m / la + m / lb + (m - t / 2) / m) / 3.0
  }

  /** Jaro-Winkler on 0..1, scaling 0.1, prefix up to 4, boost threshold
    * 0.7 (the classic Winkler parameters; matches DuckDB's
    * `jaro_winkler_similarity`, which our oracle SQL uses). */
  def jaroWinkler(a: String, b: String): Double =
    jaroWinklerBytes(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def jaroWinklerBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaroBytes(a, b)
    if (j <= 0.7) return j
    var prefix = 0
    val maxP = math.min(4, math.min(a.length, b.length))
    while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** UTF8String entry points for codegen'd Catalyst expressions — avoid
    * the UTF8String→String→bytes round-trip on the join hot path. */
  def jaroWinklerUTF8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    jaroWinklerBytes(a.getBytes, b.getBytes)
}

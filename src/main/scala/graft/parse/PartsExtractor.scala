package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.util.matching.Regex

/** Structured parts extraction — the reference's "UDTF" (one row in,
  * one struct out; SURVEY.md §2.3). Ports the regex-anchor extractor
  * actually used by the reference pipeline
  * (`/root/reference/addresskit/preprocessing/normalize_and_parse.py:
  * 102-168` `normalize_and_parse`) plus the repair pass
  * (`postprocess.py:134-149` `postprocess_parts`).
  *
  * Two implementations:
  *   - [[extractExpr]]: pure Column `regexp_extract` battery — the
  *     scalable path (whole-stage codegen). `bina_adi` uses an
  *     adjacent-token approximation of the reference's
  *     "last 2 word tokens anywhere before the trigger" rule.
  *   - [[parseParts]] / [[postprocessParts]] (exposed via the
  *     `parse_parts` UDF): exact-parity Scala, golden-tested against 85
  *     vectors produced by executing the reference code itself
  *     (tools/gen_parse_golden.py — including the reference's own
  *     quirks, e.g. its `\bk:?` abbreviation rule mangling words that
  *     start with `k`).
  */
object PartsExtractor {

  case class Parts(
      mahalle: Option[String] = None,
      cadde: Option[String] = None,
      sokak: Option[String] = None,
      no: Option[String] = None,
      daire: Option[String] = None,
      kat: Option[String] = None,
      bina_adi: Option[String] = None,
      mevkii: Option[String] = None,
      il: Option[String] = None,
      ilce: Option[String] = None,
      confidence: Double = 0.0)

  // -- shared vocabulary (data tables from the reference) ----------------
  val cityHints: Set[String] = Set(
    "istanbul", "ankara", "izmir", "bursa", "antalya", "muğla", "aydın",
    "tekirdağ", "kocaeli", "konya", "adana", "mersin", "samsun", "eskişehir",
    "trabzon", "kayseri", "gaziantep")
  val districtHints: Set[String] = Set(
    "fethiye", "çeşme", "bodrum", "kartal", "kadıköy", "üsküdar", "ataşehir",
    "bornova", "konak", "mamak", "keçiören", "tepebaşı", "odunpazarı",
    "tarsus", "tekkeköy")
  /** 81 provinces + ascii variants (postprocess.py:5-16). */
  val ilSet: Set[String] = Set(
    "adana","adiyaman","afyonkarahisar","ağrı","amasya","ankara","antalya","artvin","aydın","aydin",
    "balıkesir","bilecik","bingöl","bitlis","bolu","burdur","bursa","çanakkale","canakkale","çankırı",
    "cankiri","çorum","corum","denizli","diyarbakır","diyarbakir","edirne","elazığ","elazig","erzincan",
    "erzurum","eskişehir","eskisehir","gaziantep","giresun","gümüşhane","gumushane","hakkari","hatay",
    "ısparta","isparta","mersin","istanbul","izmir","kars","kastamonu","kayseri","kırklareli","kirklareli",
    "kırşehir","kirsehir","kocaeli","konya","kütahya","kutahya","malatya","manisa","kahramanmaraş",
    "kahramanmaras","mardin","muğla","mugla","muş","mus","nevşehir","nevsehir","niğde","nigde","ordu",
    "rize","sakarya","samsun","siirt","sinop","sivas","tekirdağ","tekirdag","tokat","trabzon","tunceli",
    "şanlıurfa","sanliurfa","uşak","usak","van","yalova","yozgat","zonguldak","karabük","karabuk","kilis",
    "osmaniye","düzce","duzce","bayburt","ardahan","iğdır","igdir","karaman","kırıkkale","kirikkale","bartın","bartin")

  private val stopSet = "mahalle|cadde|sokak|bulvar|no|daire|kat|mevkii|apartman|hotel|otel|plaza|blok|işhanı|iş hanı"
  /** Regex vocab shared with the DuckDB oracle mirror of [[extractExpr]]
    * (ExtraQueries `p_parts_struct`). */
  private[graft] def stopAlternation: String = stopSet
  private[graft] val buildingAlternation =
    "apartman|residence|rezidans|blok|işhanı|iş hanı|plaza|hotel|otel"
  private val buildingTriggers = Set("apartman", "residence", "rezidans", "blok",
    "işhanı", "iş", "hanı", "otel", "hotel", "plaza") // X2 trigger list (regex alternation below)
  private val cutWords = Set("no", "daire", "kat", "mevkii", "il", "ilçe", "ilce")
  private val fieldWords = Set("mahalle", "cadde", "sokak", "bulvar")

  // -- exact-parity scalar implementation (X2) ---------------------------

  private val ReNo: Regex = "(?U)\\bno\\s*([0-9]+[a-z]?(?:/[0-9a-z]+)?)\\b".r
  private val ReDaire: Regex = "(?U)\\bdaire\\s*([0-9a-z]+)\\b".r
  private val ReKat: Regex = "(?U)\\bkat\\s*([0-9a-z]+)\\b".r
  private val ReNumSok: Regex = "(?iU)\\b(\\d+)\\s+sokak\\b".r
  private val ReMevkii: Regex = "(?U)\\b([a-zğüşiöç\\-]+)\\s+mevkii\\b".r
  private val ReBuilding: Regex =
    "(?U)\\b(apartman|residence|rezidans|blok|işhanı|iş hanı|plaza|hotel|otel)\\b".r
  private val ReNumValue: Regex = "\\d+[a-z]?".r
  private val ReWordTok: Regex = "(?U)[a-zğüşiöç\\-]+".r
  private val ReLeadingNo: Regex = "(?U)^\\bno\\b\\s*\\d+[a-z]?/?\\d*\\s*".r
  private val ReLeadingNum: Regex = "(?U)^\\d+[a-z]?\\s*".r

  private def collapse(s: String): String = s.replaceAll("\\s+", " ").trim

  private def followingName(txt: String, anchor: String): Option[String] = {
    val pat = (s"(?U)$anchor\\s+([a-zğüşiöç0-9 \\-]+?)\\s+(?=($stopSet|$$))").r
    pat.findFirstMatchIn(txt).map(m => collapse(m.group(1))).filter(_.nonEmpty)
  }

  /** Exact port of normalize_and_parse's extraction stage (on text that
    * already went through ReferenceNormalizer.cleanText). */
  def parseParts(txt: String): Parts = {
    var p = Parts()
    ReNo.findFirstMatchIn(txt).foreach { m =>
      val v = m.group(1).trim
      v.split("/", 2) match {
        case Array(n, d) if n.forall(_.isDigit) && d.nonEmpty && d.forall(_.isDigit) =>
          p = p.copy(no = Some(n), daire = Some(d))
        case _ => p = p.copy(no = Some(v))
      }
    }
    ReDaire.findFirstMatchIn(txt).map(_.group(1)).foreach { v =>
      if (ReNumValue.pattern.matcher(v).matches() && p.daire.isEmpty)
        p = p.copy(daire = Some(v.trim))
    }
    ReKat.findFirstMatchIn(txt).map(_.group(1)).foreach { v =>
      if (ReNumValue.pattern.matcher(v).matches()) p = p.copy(kat = Some(v.trim))
    }
    followingName(txt, "mahalle").foreach(v => p = p.copy(mahalle = Some(v)))
    followingName(txt, "cadde").foreach(v => p = p.copy(cadde = Some(v)))
    ReNumSok.findFirstMatchIn(txt) match {
      case Some(m) => p = p.copy(sokak = Some(m.group(1)))
      case None => followingName(txt, "sokak").foreach(v => p = p.copy(sokak = Some(v)))
    }
    ReMevkii.findFirstMatchIn(txt).foreach(m => p = p.copy(mevkii = Some(m.group(1))))
    ReBuilding.findFirstMatchIn(txt).foreach { m =>
      val before = ReWordTok.findAllIn(txt.substring(0, m.start)).toVector
      var name = (before.takeRight(2) :+ m.group(1)).mkString(" ").trim
      name = ReLeadingNo.replaceFirstIn(name, "").trim
      name = ReLeadingNum.replaceFirstIn(name, "").trim
      if (name.nonEmpty) p = p.copy(bina_adi = Some(name))
    }
    // il / ilçe guess: scan '/'-split pieces right-to-left
    // (normalize_and_parse.py:90-100). python takes an arbitrary member
    // of the set intersection; we take the first token in piece order —
    // identical whenever a piece holds at most one hint.
    var (il, ilce) = (Option.empty[String], Option.empty[String])
    txt.split("/").map(collapse).reverseIterator.foreach { piece =>
      val toks = piece.split(" ").toVector
      if (il.isEmpty) il = toks.find(cityHints.contains)
      if (ilce.isEmpty) ilce = toks.find(districtHints.contains)
    }
    p = p.copy(il = il, ilce = ilce)
    p.copy(confidence = confidenceX2(p))
  }

  /** X6 confidence (normalize_and_parse.py:160-166): 0.2 per found
    * field, +0.2 if no, +0.2 if any of mahalle/cadde/sokak; clamp 0..1,
    * round 2. */
  private def confidenceX2(p: Parts): Double = {
    val found = Seq(p.mahalle, p.cadde, p.sokak, p.no, p.daire, p.kat,
      p.bina_adi, p.mevkii, p.il, p.ilce).count(_.isDefined)
    var s = 0.2 * found
    if (p.no.isDefined) s += 0.2
    if (p.mahalle.isDefined || p.cadde.isDefined || p.sokak.isDefined) s += 0.2
    math.round(math.max(0.0, math.min(1.0, s)) * 100) / 100.0
  }

  // -- exact-parity postprocess pass (X5, postprocess.py) ----------------

  private val ReNumVal2: Regex = "\\d+[a-z]?".r
  private val ReNumSok2: Regex = "(?U)\\b(\\d+)\\s+sokak\\b".r
  private val ReMevkii2: Regex = "(?U)\\b([a-zçğıöşü\\-]+)\\s+mevkii\\b".r
  private val ReAlpha2: Regex = "(?U)^[a-zçğıöşü]+$".r
  private val ReSlashPair: Regex = "(?U)^[a-zçğıöşü]+/[a-zçğıöşü]+$".r
  private val RePostTok: Regex = "(?U)^[a-zçğıöşü\\-]+$".r
  private val postTriggers = Set("apartman", "residence", "rezidans", "işhanı",
    "iş", "hanı", "otel", "hotel", "site", "blok", "plaza", "tower")

  private def beforeAfter(label: String, toks: Vector[String], maxTokens: Int,
      allowNumeric: Boolean): (String, String) = {
    val i = toks.indexOf(label)
    if (i < 0) return ("", "")
    def scan(range: Iterator[Int]): Vector[String] = {
      val out = Vector.newBuilder[String]
      var n = 0
      var stop = false
      range.foreach { j =>
        if (!stop && n < maxTokens) {
          val w = toks(j)
          if (cutWords.contains(w) || fieldWords.contains(w) ||
            (!allowNumeric && w.exists(_.isDigit))) stop = true
          else { out += w; n += 1 }
        }
      }
      out.result()
    }
    val b = scan(Iterator.range(i - 1, -1, -1)).reverse.mkString(" ").trim
    val a = scan(Iterator.range(i + 1, toks.length)).mkString(" ").trim
    (b, a)
  }

  /** Exact port of postprocess_parts (postprocess.py:134-149): no/daire
    * split, numeric gates, sokak repair, before/after window reassign,
    * building-name rebuild, mevkii, il/ilçe from the last-8-token tail,
    * field cleanup, recomputed confidence; empty fields dropped. */
  def postprocessParts(normalized: String, in: Parts): Parts = {
    var p = in
    // _fix_no_and_daire
    p.no.filter(_.contains("/")).foreach { v =>
      val Array(n, d) = v.split("/", 2)
      if (n.nonEmpty && n.forall(_.isDigit) && d.nonEmpty && d.forall(_.isDigit))
        p = p.copy(no = Some(n), daire = Some(d))
    }
    if (p.daire.exists(d => !ReNumVal2.pattern.matcher(d).matches()))
      p = p.copy(daire = None)
    // _fix_kat
    if (p.kat.exists(k => !ReNumVal2.pattern.matcher(k).matches()))
      p = p.copy(kat = None)
    // _fix_sokak
    if (p.sokak.exists(_.startsWith("no"))) {
      p = ReNumSok2.findFirstMatchIn(normalized) match {
        case Some(m) => p.copy(sokak = Some(m.group(1)))
        case None => p.copy(sokak = None)
      }
    }
    // _reassign_mahalle_cadde_sokak
    val toks = normalized.split(" ").toVector
    locally {
      val (b, a) = beforeAfter("mahalle", toks, 3, allowNumeric = false)
      if (b.nonEmpty) p = p.copy(mahalle = Some(b))
      else if (a.nonEmpty) p = p.copy(mahalle = Some(a))
    }
    locally {
      val (b, a) = beforeAfter("cadde", toks, 3, allowNumeric = false)
      if (b.nonEmpty) p = p.copy(cadde = Some(b))
      else if (a.nonEmpty) p = p.copy(cadde = Some(a))
    }
    locally {
      val (b, a) = beforeAfter("sokak", toks, 3, allowNumeric = true)
      if (b.nonEmpty && b.replace("/", "").forall(_.isDigit)) p = p.copy(sokak = Some(b))
      else if (a.nonEmpty && !a.split(" ").take(1).exists(_.exists(_.isDigit)))
        p = p.copy(sokak = Some(a))
    }
    // _fix_building_name
    toks.zipWithIndex.find { case (t, _) => postTriggers.contains(t) }.foreach {
      case (t, i) =>
        val nameToks = ((i - 2) until i).filter(j => j >= 0 &&
          RePostTok.pattern.matcher(toks(j)).matches() && !cutWords.contains(toks(j)))
          .map(toks(_)) :+ t
        var cand = nameToks.mkString(" ").trim
        cand = ReLeadingNo.replaceFirstIn(cand, "").trim
        cand = ReLeadingNum.replaceFirstIn(cand, "").trim
        val cur = p.bina_adi.getOrElse("")
        if (cand.nonEmpty && (cur.isEmpty || cur == t ||
          cur.startsWith("no") || cur.headOption.exists(_.isDigit)))
          p = p.copy(bina_adi = Some(cand))
    }
    // _fix_mevkii
    ReMevkii2.findFirstMatchIn(normalized).foreach(m => p = p.copy(mevkii = Some(m.group(1))))
    // _parse_city_district_from_tail
    val tail = toks.takeRight(8)
    var done = false
    tail.reverseIterator.foreach { w =>
      if (!done && w.contains("/") && ReSlashPair.pattern.matcher(w).matches()) {
        val Array(a, b) = w.split("/", 2)
        if (ilSet.contains(b) && !ilSet.contains(a)) { p = p.copy(il = Some(b), ilce = Some(a)); done = true }
        else if (ilSet.contains(a) && !ilSet.contains(b)) { p = p.copy(il = Some(a), ilce = Some(b)); done = true }
      }
    }
    if (!done) {
      var k = tail.length - 1
      while (!done && k > 0) {
        val (a, b) = (tail(k - 1), tail(k))
        if (ReAlpha2.pattern.matcher(a).matches() && ReAlpha2.pattern.matcher(b).matches()
          && ilSet.contains(b) && !ilSet.contains(a)) {
          p = p.copy(il = Some(b), ilce = Some(a)); done = true
        }
        k -= 1
      }
    }
    // field cleanup: strip trailing "no..." and double spaces
    def cleanField(v: Option[String]) = v.map(x =>
      collapse(x.replaceAll("(?U)\\bno\\b.*$", "").trim)).filter(_.nonEmpty)
    p = p.copy(mahalle = cleanField(p.mahalle), cadde = cleanField(p.cadde),
      sokak = cleanField(p.sokak))
    // _recompute_confidence (0.22 base fields + 0.06 extras, cap 1.0)
    var s = 0.22 * Seq(p.mahalle, p.cadde, p.sokak, p.no).count(_.isDefined)
    if (p.daire.isDefined) s += 0.06
    if (p.kat.isDefined) s += 0.06
    if (p.bina_adi.isDefined || p.mevkii.isDefined) s += 0.06
    if (p.il.isDefined) s += 0.06
    val conf = math.round(math.min(1.0, s) * 100) / 100.0
    // drop empties (postprocess returns only truthy values)
    def ne(v: Option[String]) = v.filter(_.nonEmpty)
    Parts(ne(p.mahalle), ne(p.cadde), ne(p.sokak), ne(p.no), ne(p.daire),
      ne(p.kat), ne(p.bina_adi), ne(p.mevkii), ne(p.il), ne(p.ilce), conf)
  }

  def parseAndPost(txt: String): Parts =
    postprocessParts(txt, parseParts(txt))

  // -- Spark surface ------------------------------------------------------

  /** Exact-parity UDF: cleanText output -> full parsed+postprocessed
    * struct. One row in, one struct out (no Generator needed). */
  val parse_parts = udf((s: String) => if (s == null) null else parseAndPost(s))

  /** X4 tail il/ilçe parse as a pure Column battery — the postprocess
    * `_parse_city_district_from_tail` rules (postprocess.py:100-131)
    * over the last 8 tokens, scanned right-to-left:
    *   1. an alpha `a/b` slash pair with EXACTLY ONE side in the
    *      81-province set → (il, ilce) = (province side, other side);
    *   2. else an adjacent alpha pair (a, b) with b a province and a
    *      not → il = b, ilce = a.
    * Null-safe array access via `get` (0-based) — ANSI mode is on in
    * Spark 4 and `element_at` inside a filter lambda would throw on a
    * slash-less token. Returns struct(il, ilce). */
  def tailIlIlceExpr(txt: Column): Column = {
    val ilArr = lit(ilSet.toArray.sorted)
    def inIl(c: Column): Column = array_contains(ilArr, c)
    val toks = filter(split(txt, " "), t => t =!= "")
    val tail = slice(toks, greatest(size(toks) - 7, lit(1)), lit(8))
    val tailR = reverse(tail)
    val slashCands = filter(tailR, w =>
      w.rlike("^[a-zçğıöşü]+/[a-zçğıöşü]+$") &&
        (inIl(get(split(w, "/"), lit(0))) =!= inIl(get(split(w, "/"), lit(1)))))
    val slashFirst = when(size(slashCands) > 0, element_at(slashCands, 1))
    val sa = get(split(slashFirst, "/"), lit(0))
    val sb = get(split(slashFirst, "/"), lit(1))
    val slashIl = when(inIl(sb), sb).otherwise(sa)
    val slashIlce = when(inIl(sb), sa).otherwise(sb)
    // adjacent pairs in right-to-left order: struct("0" = left token a,
    // "1" = right token b); the zip's trailing struct has a null "0"
    // and is dropped by the filter's null-propagating predicate
    val pairsR = arrays_zip(slice(tailR, 2, 8), tailR)
    val pairCands = filter(pairsR, p =>
      p.getField("0").rlike("^[a-zçğıöşü]+$") &&
        p.getField("1").rlike("^[a-zçğıöşü]+$") &&
        inIl(p.getField("1")) && !inIl(p.getField("0")))
    val pairFirst = when(size(pairCands) > 0, element_at(pairCands, 1))
    val il = when(slashFirst.isNotNull, slashIl).otherwise(pairFirst.getField("1"))
    val ilce = when(slashFirst.isNotNull, slashIlce).otherwise(pairFirst.getField("0"))
    struct(il.as("il"), ilce.as("ilce"))
  }

  /** Pure-Column battery (X2 subset; scalable path). `bina_adi` is the
    * adjacent-two-token approximation. */
  def extractExpr(txt: Column): Column = {
    def nonEmpty(c: Column): Column = when(c =!= "", c)
    val no0 = nonEmpty(regexp_extract(txt, "(?U)\\bno\\s*([0-9]+[a-z]?(?:/[0-9a-z]+)?)\\b", 1))
    val noSplit = split(no0, "/")
    val hasSplit = no0.isNotNull && size(noSplit) === 2 &&
      element_at(noSplit, 1).rlike("^\\d+$") && element_at(noSplit, 2).rlike("^\\d+$")
    val no = when(hasSplit, element_at(noSplit, 1)).otherwise(no0)
    val daireFromNo = when(hasSplit, element_at(noSplit, 2))
    val daireRaw = nonEmpty(regexp_extract(txt, "(?U)\\bdaire\\s*([0-9a-z]+)\\b", 1))
    val daire = coalesce(daireFromNo,
      when(daireRaw.rlike("^\\d+[a-z]?$"), daireRaw))
    val katRaw = nonEmpty(regexp_extract(txt, "(?U)\\bkat\\s*([0-9a-z]+)\\b", 1))
    val kat = when(katRaw.rlike("^\\d+[a-z]?$"), katRaw)
    def following(anchor: String): Column = nonEmpty(trim(regexp_replace(
      regexp_extract(txt, s"(?U)$anchor\\s+([a-zğüşiöç0-9 \\-]+?)\\s+(?=($stopSet|$$))", 1),
      "\\s+", " ")))
    val mahalle = following("mahalle")
    val cadde = following("cadde")
    val sokak = coalesce(
      nonEmpty(regexp_extract(txt, "(?U)\\b(\\d+)\\s+sokak\\b", 1)),
      following("sokak"))
    val mevkii = nonEmpty(regexp_extract(txt, "(?U)\\b([a-zğüşiöç\\-]+)\\s+mevkii\\b", 1))
    val bina = nonEmpty(trim(regexp_replace(regexp_extract(txt,
      s"(?U)(?:([a-zğüşiöç\\-]+)\\s+)?(?:([a-zğüşiöç\\-]+)\\s+)?\\b($buildingAlternation)\\b",
      0), "(?U)^(\\bno\\b\\s*\\d+[a-z]?/?\\d*\\s*|\\d+[a-z]?\\s*)", "")))
    // il/ilçe: first hint scanning '/'-pieces right to left
    val pieces = reverse(split(txt, "/"))
    def hintScan(hints: Set[String]): Column = {
      val hs: Column = lit(hints.toArray)
      val hits: Column = flatten(transform(pieces, (p: Column) =>
        filter(split(trim(regexp_replace(p, "\\s+", " ")), " "),
          (t: Column) => array_contains(hs, t))))
      when(size(hits) > 0, element_at(hits, 1))
    }
    val il = hintScan(cityHints)
    val ilce = hintScan(districtHints)
    val fields = Seq(mahalle, cadde, sokak, no, daire, kat, bina, mevkii, il, ilce)
    val foundCnt = fields.map(f => when(f.isNotNull, 1).otherwise(0)).reduce(_ + _)
    val conf0 = lit(0.2) * foundCnt +
      when(no.isNotNull, 0.2).otherwise(0.0) +
      when(mahalle.isNotNull || cadde.isNotNull || sokak.isNotNull, 0.2).otherwise(0.0)
    val conf = round(least(greatest(conf0, lit(0.0)), lit(1.0)), 2)
    struct(
      mahalle.as("mahalle"), cadde.as("cadde"), sokak.as("sokak"), no.as("no"),
      daire.as("daire"), kat.as("kat"), bina.as("bina_adi"), mevkii.as("mevkii"),
      il.as("il"), ilce.as("ilce"), conf.as("confidence"))
  }
}

package graft.parse

import graft.SparkSpec
import graft.normalize.ReferenceNormalizer
import org.apache.spark.sql.functions._
import scala.io.Source

/** Reference-parity tests for the Turkish normalize + parse path.
  * Golden vectors were produced by EXECUTING the reference code
  * (normalize_and_parse.clean_text / normalize_and_parse /
  * postprocess_parts) on 85 synthetic addresses — see
  * tools/gen_parse_golden.py. Parity includes the reference's own
  * quirks (its `\bk:?` rule rewriting k-initial words, dots surviving
  * `\bmah\.?\b` backtracking, etc.).
  */
class ParseParitySpec extends SparkSpec {

  private case class Golden(raw: String, clean: String,
      parts: Map[String, String], post: Map[String, String])

  // minimal JSON reader for our generator's flat shape (no nesting
  // beyond the two dicts; values are strings or the _confidence number)
  private lazy val goldens: Seq[Golden] = {
    val src = Source.fromResource("parse_golden.json")(scala.io.Codec.UTF8)
    val txt = try src.mkString finally src.close()
    val objPat = """\{"raw":.*?\}\}""".r
    def field(o: String, k: String): String = {
      val m = (s""""$k": "((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(o)
      m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse(
        sys.error(s"missing $k in $o"))
    }
    def dict(o: String, k: String): Map[String, String] = {
      val m = (s""""$k": \\{(.*?)\\}""").r.findFirstMatchIn(o).get.group(1)
      if (m.trim.isEmpty) Map.empty
      else """"([^"]+)": (?:"((?:[^"\\]|\\.)*)"|([0-9.]+))""".r.findAllMatchIn(m).map { g =>
        g.group(1) -> Option(g.group(2)).getOrElse(g.group(3))
      }.toMap
    }
    objPat.findAllIn(txt).toSeq.map { o =>
      Golden(field(o, "raw"), field(o, "clean"), dict(o, "parts"), dict(o, "post"))
    }
  }

  private def partsToMap(p: PartsExtractor.Parts): Map[String, String] = {
    val m = Seq(
      "mahalle" -> p.mahalle, "cadde" -> p.cadde, "sokak" -> p.sokak,
      "no" -> p.no, "daire" -> p.daire, "kat" -> p.kat,
      "bina_adı" -> p.bina_adi, "mevkii" -> p.mevkii,
      "il" -> p.il, "ilçe" -> p.ilce).collect { case (k, Some(v)) => k -> v }.toMap
    m + ("_confidence" -> p.confidence.toString)
  }

  private def normConf(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) =>
      k -> (if (k == "_confidence") v.toDouble.toString else v)
    }

  test("cleanText matches the reference's clean_text on all 85 goldens") {
    import spark.implicits._
    val gs = goldens
    assert(gs.size == 85, s"parsed ${gs.size} goldens")
    val out = gs.map(_.raw).toDF("raw")
      .select(ReferenceNormalizer.cleanText(col("raw")).as("c"))
      .collect().map(_.getString(0))
    gs.zip(out).foreach { case (g, c) =>
      assert(c == g.clean, s"cleanText(${g.raw})\n got: $c\n want: ${g.clean}")
    }
  }

  test("parseParts matches the reference's normalize_and_parse parts") {
    goldens.foreach { g =>
      val got = normConf(partsToMap(PartsExtractor.parseParts(g.clean)))
      val want = normConf(g.parts)
      assert(got == want, s"parseParts(${g.clean})\n got: $got\n want: $want")
    }
  }

  test("parseAndPost matches the reference's postprocess_parts") {
    goldens.foreach { g =>
      val got = normConf(partsToMap(PartsExtractor.parseAndPost(g.clean)))
      val want = normConf(g.post)
      assert(got == want, s"parseAndPost(${g.clean})\n got: $got\n want: $want")
    }
  }

  test("Column battery agrees with parseParts on regex-expressible fields") {
    import spark.implicits._
    val gs = goldens
    val rows = gs.map(_.clean).toDF("c")
      .select(PartsExtractor.extractExpr(col("c")).as("p"))
      .select("p.*").collect()
    gs.zip(rows).foreach { case (g, r) =>
      val exact = PartsExtractor.parseParts(g.clean)
      def f(n: String): Option[String] =
        Option(r.getAs[String](n)).filter(_.nonEmpty)
      assert(f("no") == exact.no, s"no @ ${g.clean}")
      assert(f("daire") == exact.daire, s"daire @ ${g.clean}")
      assert(f("kat") == exact.kat, s"kat @ ${g.clean}")
      assert(f("mahalle") == exact.mahalle, s"mahalle @ ${g.clean}")
      assert(f("cadde") == exact.cadde, s"cadde @ ${g.clean}")
      assert(f("sokak") == exact.sokak, s"sokak @ ${g.clean}")
      assert(f("mevkii") == exact.mevkii, s"mevkii @ ${g.clean}")
      assert(f("il") == exact.il, s"il @ ${g.clean}")
      assert(f("ilce") == exact.ilce, s"ilce @ ${g.clean}")
    }
  }

  test("tr lowercase variants and diacritic folding") {
    import spark.implicits._
    val df = Seq("İstanbul IĞDIR çĞüŞö").toDF("s")
    val r = df.select(
      ReferenceNormalizer.trSafeLower(col("s")),
      ReferenceNormalizer.trLower(col("s")),
      ReferenceNormalizer.foldDiacritics(ReferenceNormalizer.trLower(col("s")))).head()
    // tr_safe_lower: İ->I then lower => i
    assert(r.getString(0) == "istanbul iğdir çğüşö") // python I.lower()=i
    // tr_lower: İ->i, I->ı
    assert(r.getString(1) == "istanbul ığdır çğüşö")
    assert(r.getString(2) == "istanbul igdir cgusö".replace("ö", "o"))
  }
}

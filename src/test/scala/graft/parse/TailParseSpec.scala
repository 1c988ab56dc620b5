package graft.parse

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit vectors for the X4 tail il/ilçe Column battery
  * ([[PartsExtractor.tailIlIlceExpr]]) — the driver oracle
  * (p_parts_tail) hash-checks it against DuckDB over the address
  * fixture; these pin the rule semantics on hand-written edges the
  * fixture doesn't produce.
  */
class TailParseSpec extends SparkSpec {
  import spark.implicits._

  private def parse(texts: String*): Seq[(Option[String], Option[String])] = {
    texts.toDF("t")
      .select(PartsExtractor.tailIlIlceExpr(col("t")).as("p"))
      .select(col("p.il"), col("p.ilce"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
      .toSeq
  }

  test("slash pair: province side becomes il regardless of order") {
    assert(parse("x mahalle kadikoy/istanbul") ==
      Seq((Some("istanbul"), Some("kadikoy"))))
    assert(parse("x mahalle istanbul/kadikoy") ==
      Seq((Some("istanbul"), Some("kadikoy"))))
  }

  test("slash pair with both or neither province does not fire") {
    // both provinces -> rule skipped, no adjacent fallback fires either
    assert(parse("x ankara/istanbul") == Seq((None, None)))
    // neither -> skipped; adjacent pair (foo, bar) not provinces
    assert(parse("x foo/bar") == Seq((None, None)))
  }

  test("adjacent pair: b province, a not, both alpha") {
    assert(parse("yolu nilufer bursa") == Seq((Some("bursa"), Some("nilufer"))))
    // a is numeric -> not alpha -> scan continues leftward
    assert(parse("nilufer bursa no 12") == Seq((Some("bursa"), Some("nilufer"))))
    // a itself a province -> that pair is skipped, but the scan keeps
    // moving left and fires on the next pair (reference semantics)
    assert(parse("x ankara istanbul") == Seq((Some("ankara"), Some("x"))))
  }

  test("slash rule wins over a later-seen adjacent pair; rightmost first") {
    // scanning right-to-left the slash pair is found first
    assert(parse("konak izmir then kadikoy/istanbul") ==
      Seq((Some("istanbul"), Some("kadikoy"))))
    // two adjacent candidates: the rightmost wins
    assert(parse("konak izmir sonra nilufer bursa") ==
      Seq((Some("bursa"), Some("nilufer"))))
  }

  test("only the last 8 tokens are scanned") {
    val far = "nilufer bursa " + (1 to 8).map(i => s"t$i").mkString(" ")
    assert(parse(far) == Seq((None, None)))
    val near = "nilufer bursa " + (1 to 6).map(i => s"t$i").mkString(" ")
    assert(parse(near) == Seq((Some("bursa"), Some("nilufer"))))
  }
}

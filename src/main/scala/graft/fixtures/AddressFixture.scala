package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic labeled address corpus (FIXTURES.md §2) — the
  * reference-shaped two-sided match input (left.csv / right.csv with
  * `id,address[,lat,lon]`, tests/test_match.py:12-13), synthesized
  * in-query from `customer.parquet` keys. Every construct is portable
  * to DuckDB so the driver's oracle can replay it.
  *
  * Entity attributes are modular projections of `c_custkey`; the pools
  * are sized co-prime-ish so attribute tuples are unique within any
  * realistic scale factor. The right side applies the reference's dirty
  * variation families (abbreviations normalize_part.py:10-25, case
  * flips, keyed-number formats `no:12`/`d:3`/`k:2`
  * normalize_and_parse.py:66-71, `district/city` slash form): after
  * address normalization left and right variant 1 converge to the same
  * canonical string; variant 2 differs only by the dropped district
  * token. Labeled ground truth: left k matches right k.
  *
  * Geo: deterministic lat/lon per entity with variant jitter below the
  * geo_max_km decay radius — exercises J8-J10 (haversine + linear decay
  * + weight renormalization).
  */
object AddressFixture {

  val mahalles = Seq("yildiz", "cumhuriyet", "atakent", "bahcelievler", "esentepe",
    "gulbahar", "kavakli", "merkez", "sahil", "pinarbasi", "toros", "yenikoy",
    "ulus", "fatih", "barbaros", "karsiyaka", "osmanaga")
  val cities = Seq(("istanbul", "kadikoy"), ("istanbul", "sisli"), ("ankara", "cankaya"),
    ("izmir", "bornova"), ("izmir", "konak"), ("bursa", "nilufer"),
    ("antalya", "muratpasa"), ("mugla", "fethiye"))

  private def elem(values: Seq[String], idx: String): String =
    s"CASE $idx ${values.zipWithIndex.map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ")} END"

  /** Attribute expressions over a bigint key column `k` (identical SQL
    * text works in Spark and DuckDB). */
  // NOTE on portability: `/` is float division in both engines and
  // double->int casts truncate in Spark but round in DuckDB, so integer
  // division is spelled CAST(floor(x/y) AS BIGINT); bare decimal
  // literals are DECIMAL (not DOUBLE) in both SQL dialects, so every
  // fractional constant is CAST to DOUBLE explicitly.
  private def attrs(k: String): Map[String, String] = Map(
    "mah" -> elem(mahalles, s"CAST($k % 17 AS INT)"),
    // small street-number pool on purpose: with 17 mahalle names this
    // yields ~204 distinct blocking keys at every scale, so blocks GROW
    // with the data — the skew/scale stress the north rule asks for
    // (AQE skew-join + optional salting handle it).
    "snum" -> s"CAST(850 + ($k * 37) % 12 AS STRING)",
    "no" -> s"CAST(1 + $k % 95 AS STRING)",
    "daire" -> s"CAST(1 + $k % 7 AS STRING)",
    "kat" -> s"CAST(1 + $k % 5 AS STRING)",
    "city" -> elem(cities.map(_._1), s"CAST(CAST(floor($k / 3) AS BIGINT) % 8 AS INT)"),
    "district" -> elem(cities.map(_._2), s"CAST(CAST(floor($k / 3) AS BIGINT) % 8 AS INT)"),
    "lat" -> s"(CAST(36.0 AS DOUBLE) + ($k % 700) * CAST(0.01 AS DOUBLE))",
    "lon" -> s"(CAST(26.0 AS DOUBLE) + ($k % 1900) * CAST(0.01 AS DOUBLE))")

  /** Raw address string per side. side 0 = left canonical-ish; 1 =
    * abbreviated/uppercased; 2 = alternate abbreviations, district
    * dropped. */
  def addressSql(k: String, side: Int): String = {
    val a = attrs(k)
    side match {
      case 0 =>
        s"(${a("mah")} || ' mahalle ' || ${a("snum")} || ' sokak no ' || ${a("no")} || ' daire ' || ${a("daire")} || ' kat ' || ${a("kat")} || ' ' || ${a("district")} || ' ' || ${a("city")})"
      case 1 =>
        s"upper(${a("mah")} || ' mah. ' || ${a("snum")} || ' sk. no:' || ${a("no")} || ' d:' || ${a("daire")} || ' k:' || ${a("kat")} || ' ' || ${a("district")} || '/' || ${a("city")})"
      case _ =>
        s"(${a("mah")} || ' mh ' || ${a("snum")} || ' sok no ' || ${a("no")} || '/' || ${a("daire")} || ' kat ' || ${a("kat")} || ' ' || ${a("city")})"
    }
  }

  /** customer.parquet is one small file → one scan partition, and the
    * address synthesis + the 18-regex normalize chain a caller stacks on
    * top would run on ONE core until the first exchange. Spread the raw
    * keys (8 bytes/row) across a cores-tracking partition count
    * ([[graft.util.Parallelism.spread]]) before the synthesis
    * expressions (guide §2.5) — output rows identical, oracle hashes
    * row-order-insensitive. */
  private def keys(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"))
      .repartition(graft.util.Parallelism.spread(spark))

  /** Left table: id, address, lat, lon. */
  def left(spark: SparkSession, sfDir: String): DataFrame =
    keys(spark, sfDir)
      .selectExpr(
        "CAST(c_custkey AS STRING) AS id",
        s"${addressSql("c_custkey", 0)} AS address",
        s"${attrs("c_custkey")("lat")} AS lat",
        s"${attrs("c_custkey")("lon")} AS lon")

  /** Right-side id prefix and geo jitter per dirty-variant side. */
  def sidePrefix(side: Int): String = if (side == 1) "r" else "s"
  private def sideJitter(side: Int): String =
    if (side == 1) "0.003" else "0.006"

  /** Right table: one dirty variant per entity (`side` 1 or 2), with a
    * small deterministic geo jitter (side 1: ~0.33 km, side 2: ~0.67 km
    * north — inside the 1.5 km geo decay radius). */
  def right(spark: SparkSession, sfDir: String, side: Int = 1): DataFrame =
    keys(spark, sfDir)
      .selectExpr(
        s"'${sidePrefix(side)}' || CAST(c_custkey AS STRING) AS id",
        s"${addressSql("c_custkey", side)} AS address",
        s"(${attrs("c_custkey")("lat")} + CAST(${sideJitter(side)} AS DOUBLE)) AS lat",
        s"${attrs("c_custkey")("lon")} AS lon")

  /** Both dirty variants unioned — the full right table. */
  def rightAll(spark: SparkSession, sfDir: String): DataFrame =
    right(spark, sfDir, 1).unionAll(right(spark, sfDir, 2))

  // DuckDB mirrors -------------------------------------------------------

  def leftCteDuck: String =
    s"""addr_left AS (
       |  SELECT CAST(c_custkey AS STRING) AS id,
       |         ${addressSql("c_custkey", 0)} AS address,
       |         ${attrs("c_custkey")("lat")} AS lat,
       |         ${attrs("c_custkey")("lon")} AS lon
       |  FROM customer
       |)""".stripMargin

  def rightCteDuck: String =
    s"""addr_right AS (
       |  SELECT '${sidePrefix(1)}' || CAST(c_custkey AS STRING) AS id,
       |         ${addressSql("c_custkey", 1)} AS address,
       |         (${attrs("c_custkey")("lat")} + CAST(${sideJitter(1)} AS DOUBLE)) AS lat,
       |         ${attrs("c_custkey")("lon")} AS lon
       |  FROM customer
       |  UNION ALL
       |  SELECT '${sidePrefix(2)}' || CAST(c_custkey AS STRING) AS id,
       |         ${addressSql("c_custkey", 2)} AS address,
       |         (${attrs("c_custkey")("lat")} + CAST(${sideJitter(2)} AS DOUBLE)) AS lat,
       |         ${attrs("c_custkey")("lon")} AS lon
       |  FROM customer
       |)""".stripMargin
}

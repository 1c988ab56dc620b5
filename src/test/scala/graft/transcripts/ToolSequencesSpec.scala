package graft.transcripts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tool-sequence features (T4): bigram construction order/dedup,
  * enrichment null semantics, hand-computed Jaccard, fixture sanity. */
class ToolSequencesSpec extends SparkSpec {

  test("bigrams are turn-ordered, canonicalized, distinct; singleton -> empty") {
    val tks = ToolSequences.bigramTokens(spark, sf0001).cache()
    // fixture: tool turns are turn_idx % 3 == 2 with dirty spellings —
    // every bigram must be canonical>canonical (lowercase, underscores)
    val bad = tks.select(explode(col("tk")).as("b"))
      .filter(!col("b").rlike("^[a-z0-9_]+>[a-z0-9_]+$")).count()
    assert(bad == 0)
    // sets are distinct by construction
    val dup = tks.select(col("conv_id"),
      (size(col("tk")) - size(array_distinct(col("tk")))).as("d"))
      .filter(col("d") =!= 0).count()
    assert(dup == 0)
    assert(tks.count() > 0)
    tks.unpersist()
  }

  test("hand-built: order matters and value is exact") {
    import spark.implicits._
    // conv A: tools x,y,x -> bigrams {x>y, y>x}; conv B: y,x -> {y>x}
    val turns = Seq(
      ("A", 2, "tool", "c", "X!", "2025-01-01 00:00:02"),
      ("A", 5, "tool", "c", "Y", "2025-01-01 00:00:05"),
      ("A", 8, "tool", "c", "X!", "2025-01-01 00:00:08"),
      ("B", 2, "tool", "c", "Y", "2025-01-01 00:00:02"),
      ("B", 5, "tool", "c", "X!", "2025-01-01 00:00:05"))
      .map { case (cid, ti, role, txt, tool, ts) =>
        (cid, ti, role, txt, tool, java.sql.Timestamp.valueOf(ts)) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val pairs = Seq(("A", "B", 90.0)).toDF("left_id", "right_id", "score")
    // build tokens directly from the turns frame via the same lambda path
    val tks = {
      val n = size(col("sq")) - 1
      turns.filter(col("tool").isNotNull)
        .select(col("conv_id"), col("turn_idx"),
          graft.normalize.Normalizer.normTool(col("tool")).as("nt"))
        .groupBy("conv_id")
        .agg(array_sort(collect_list(struct(col("turn_idx"), col("nt")))).as("sq"))
        .select(col("conv_id"), array_distinct(
          zip_with(
            slice(col("sq"), lit(1), greatest(n, lit(0))),
            slice(col("sq"), lit(2), greatest(n, lit(0))),
            (x, y) => concat(x.getField("nt"), lit(">"), y.getField("nt")))).as("tk"))
    }
    val a = tks.filter(col("conv_id") === "A").select(explode(col("tk")))
      .collect().map(_.getString(0)).toSet
    assert(a == Set("x_>y", "y>x_"), s"got $a")
    val j = ToolSequences.jaccardEnrich(pairs, tks).collect()(0)
      .getAs[Double]("toolseq_jaccard")
    // A = {x_>y, y>x_}, B = {y>x_}: |∩|=1, |∪|=2
    assert(j == 0.5)
  }

  test("enrichment: NULL when a side is missing or both sets empty") {
    import spark.implicits._
    val pairs = Seq(("A", "Z", 80.0), ("S1", "S2", 70.0))
      .toDF("left_id", "right_id", "score")
    val tks = Seq(
      ("A", Seq("a>b")),
      ("S1", Seq.empty[String]), ("S2", Seq.empty[String])) // singletons
      .toDF("conv_id", "tk")
    val got = ToolSequences.jaccardEnrich(pairs, tks).collect()
      .map(r => (r.getAs[String]("left_id"), r.isNullAt(r.fieldIndex("toolseq_jaccard"))))
      .toMap
    assert(got == Map("A" -> true, "S1" -> true)) // Z missing; both-empty
  }

  test("fixture enrichment: pairs preserved, values in [0,1]") {
    val pairs = graft.SparkEntry.matchJw(spark, sf0001).cache()
    val out = ToolSequences.jaccardEnrich(pairs,
      ToolSequences.bigramTokens(spark, sf0001)).cache()
    assert(out.count() == pairs.count())
    val oob = out.filter(col("toolseq_jaccard").isNotNull &&
      (col("toolseq_jaccard") < 0 || col("toolseq_jaccard") > 1)).count()
    assert(oob == 0)
    assert(out.filter(col("toolseq_jaccard").isNotNull).count() > 0)
    out.unpersist(); pairs.unpersist()
  }
}

package graft.transcripts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused chunking ([[Chunks]] + posexplode) must reproduce the SQL
  * formulation (`explode(sequence(0, greatest(ceil(len/w)-1, 0)))` +
  * per-turn substring) row for row — `turns` feeds the oracle-hashed
  * t_transcripts / convNorm family. */
class TranscriptsSpec extends SparkSpec {

  private def chunksOf(c: org.apache.spark.sql.Column, w: Int) =
    org.apache.spark.sql.GraftShim.column(
      Chunks(org.apache.spark.sql.GraftShim.expression(c), w))

  test("Chunks equals sequence+substring chunking (incl. edge cases)") {
    import spark.implicits._
    val inputs = Seq(
      Some(""), Some("a"), Some("x" * 99), Some("x" * 100), Some("x" * 101),
      Some("x" * 250), Some("çğü" * 60), Some(("ab " * 80).trim), None)
    val w = 100
    val rows = inputs.toDF("s")
      .select(col("s"), chunksOf(col("s"), w).as("fused"),
        expr(s"""transform(
          sequence(0, CAST(greatest(ceil(length(s) / $w) - 1, 0) AS INT)),
          k -> substring(s, k * $w + 1, $w))""").as("chain"))
      .collect()
    rows.foreach { r =>
      val fused = r.getSeq[String](1)
      if (r.isNullAt(0)) {
        // chain: length(null) -> null -> greatest(null,0)=0 -> [substring(null)] = [null]
        assert(fused == Seq(null), s"null input gave $fused")
      } else {
        assert(fused == r.getSeq[String](2), s"input len ${r.getString(0).length}")
      }
    }
  }

  test("turns matches the archived SQL formulation row for row") {
    val fused = Transcripts.turns(spark, sf0001, variants = 3).toDF()
    val legacy = Transcripts.convDocs(spark, sf0001, 3)
      .withColumn("turn_idx",
        explode(sequence(lit(0),
          greatest(ceil(length(col("vtext")) / Transcripts.ChunkSize) - 1,
            lit(0)).cast("int"))))
      .select(
        col("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        expr("CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END")
          .as("role"),
        expr(s"substring(vtext, turn_idx * ${Transcripts.ChunkSize} + 1, ${Transcripts.ChunkSize})")
          .as("text"),
        expr(
          s"""CASE WHEN turn_idx % 3 = 2 THEN
             |  CASE (entity_id * 7 + turn_idx * 5 + variant) % ${Transcripts.toolSpellings.size}
             |    ${Transcripts.toolSpellings.zipWithIndex
                    .map { case ((d, _), i) => s"WHEN $i THEN '$d'" }.mkString(" ")}
             |  END
             |ELSE NULL END""".stripMargin).as("tool"),
        expr(s"timestamp'${Transcripts.Epoch}' + make_interval(0,0,0,0,0,0, entity_id * 1000 + variant * 100 + turn_idx)")
          .as("ts"))
    assert(fused.exceptAll(legacy).isEmpty && legacy.exceptAll(fused).isEmpty,
      "fused turns diverge from the SQL formulation")
    assert(fused.count() == legacy.count())
  }
}

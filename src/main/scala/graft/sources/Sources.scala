package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks (SURVEY.md §2.1 S1-S10): CSV ingestion with the
  * reference's robustness behaviors, header scrubbing, ordered CSV /
  * JSON / Parquet sinks, and broadcast gazetteer joins.
  */
object Sources {

  /** S1: CSV scan with encoding fallback utf-8-sig -> utf-8 -> cp1254
    * (normalize.py:19-27). Spark's CSV reader takes one charset per
    * scan, so the fallback probes a sample of raw bytes up front and
    * picks the first decodable encoding — same decision the reference
    * makes per file, applied once per path. UTF-8 BOMs are handled by
    * the reader itself. */
  def readCsvWithEncodingFallback(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path.stripPrefix("file:")))
    val sample = java.util.Arrays.copyOf(bytes, math.min(bytes.length, 1 << 20))
    val enc = Seq("UTF-8", "windows-1254").find { name =>
      val dec = java.nio.charset.Charset.forName(name).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      try { dec.decode(java.nio.ByteBuffer.wrap(sample)); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    }.getOrElse("windows-1254")
    // Spark 4 restricts CSV charsets by default; windows-1254 needs the
    // legacy java charset provider.
    if (enc != "UTF-8") spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", enc)
      .csv(path)
  }

  /** S2: robust scan — drop malformed lines
    * (`on_bad_lines="skip"`, clean_and_parse.py:232). Malformedness is
    * judged against the schema (extra/missing tokens), like the pandas
    * python-engine behavior. */
  def readCsvRobust(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
    schema.fold(r)(r.schema).csv(path)
  }

  /** S3: header scrub — strip BOM/whitespace, lowercase
    * (normalize.py:152-154, clean_and_parse.py:240-241). */
  def scrubHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.stripPrefix("﻿").trim.toLowerCase): _*)

  /** S4: CSV sink with fixed field order (DictWriter parity,
    * match.py:173-175). Writes a header even for empty output
    * (match.py:137-142 empty-input guard). */
  def writeCsvOrdered(df: DataFrame, fieldOrder: Seq[String], path: String): Unit =
    df.select(fieldOrder.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S5: JSON records sink (run_normalize.py:61-62). */
  def writeJsonRecords(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S6: Parquet sink (string_similarity.py:39). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S10: gazetteer lookup — broadcast join against a small dimension
    * table (weak_labeling.py:7-19's posta-hierarchy dict, distributed).
    */
  def gazetteerJoin(
      facts: DataFrame,
      gazetteer: DataFrame,
      factKey: String,
      gazKey: String): DataFrame =
    facts.join(broadcast(gazetteer),
      facts(factKey) === gazetteer(gazKey), "left")

  /** S8's config: the reference's YAML knobs as a typed case class is
    * MatchConfig / the Normalizer tables — see graft.matching and
    * graft.normalize (rules compiled into Column chains on the driver).
    */
}

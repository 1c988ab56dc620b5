package graft.transcripts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A single conversation turn — the engine's primary input row shape
  * (BASELINE.json `input_hint`):
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** Deterministic synthetic transcript corpus, derived **in-query** from the
  * driver-provided `documents.parquet` (TESTDATA.md) — no external data, no
  * randomness. Each document yields `variants` near-duplicate conversations
  * (latent entity id = doc_id), built with perturbations that mirror the
  * reference's dirty-input families (abbreviations
  * normalize_part.py:10-25, case flips normalize.py:40-46, punctuation
  * noise normalize_and_parse.py:46-52):
  *
  *   - v0: document text as-is
  *   - v1: abbreviation swaps (merge→mrg., window→wnd, stream→strm.,
  *     customer→cust) + stopword drop (the)
  *   - v2: uppercase + comma noise at word boundaries
  *   - v>=3 (bench scale-up only): v2's shape plus a distinct
  *     ` v<k>` suffix token
  *
  * The conversation text is then chunked into fixed-width turns with
  * stable `(conv_id, turn_idx)` ordering; roles cycle user/assistant/tool
  * and tool turns carry a dirty tool-name spelling (the graft analogue of
  * the reference's abbreviation table).
  *
  * Every step uses only engine-portable constructs (literal `replace`,
  * `substring`, arithmetic `case`) so [[oracleCte]] can replay the exact
  * derivation in DuckDB for the driver's correctness gate.
  */
object Transcripts {

  val ChunkSize = 100
  val Epoch = "2025-01-01 00:00:00"

  /** Dirty tool-name spellings by canonical tool; normalization must map
    * each row to its canonical form (Normalizer.normTool). */
  val toolSpellings: Seq[(String, String)] = Seq(
    ("Web.Search", "web_search"), ("WEB_SEARCH", "web_search"), ("web search", "web_search"),
    ("Code.Exec", "code_exec"), ("CODE_EXEC", "code_exec"), ("code exec", "code_exec"),
    ("File.IO", "file_io"), ("FILE_IO", "file_io"), ("file io", "file_io"))

  /** Per-variant perturbed conversation text + conv_id, one row per
    * (doc, variant). Columns: conv_id, entity_id, variant, vtext. */
  def convDocs(spark: SparkSession, sfDir: String, variants: Int = 3): DataFrame = {
    // documents.parquet is one small file → one scan partition, and
    // everything until the first exchange (variant CASE ×variants, both
    // explodes, per-turn substring/CASE chains, the consumer's partial
    // aggregation) would run on ONE core. Spread the doc rows across
    // a cores-tracking partition count first (scale-adaptive, not a
    // local constant; guide §2.5 "input skew — repartition immediately
    // after the read"): the shuffle moves only the raw doc rows once,
    // and every derived row downstream is born parallel. Output rows
    // are identical; the driver's oracle hash is row-order-insensitive.
    // (r06 follow-up: count = Parallelism.spread — the chain is
    // compute-bound, so tasks should track cores, not the byte-sized
    // shuffle conf; 256 tiny tasks per stage were scheduling-dominated.)
    val parts = graft.util.Parallelism.spread(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(parts)
    val v = explode(sequence(lit(0), lit(variants - 1))).as("variant")
    docs.select(col("doc_id"), col("text"), v)
      .withColumn("vtext", expr(
        s"""CASE
           |  WHEN variant = 0 THEN text
           |  WHEN variant = 1 THEN
           |    replace(replace(replace(replace(replace(text,
           |      ' merge ', ' mrg. '), ' window ', ' wnd '),
           |      ' stream ', ' strm. '), ' customer ', ' cust '),
           |      ' the ', ' ')
           |  WHEN variant = 2 THEN upper(replace(text, ' ', ' , '))
           |  ELSE concat(upper(replace(text, ' ', ' , ')), ' v', variant)
           |END""".stripMargin))
      .select(
        concat(lit("c"), col("doc_id"), lit("_"), col("variant")).as("conv_id"),
        col("doc_id").as("entity_id"),
        col("variant"),
        col("vtext"))
  }

  /** The transcript table: one row per turn, schema = [[Turn]].
    *
    * r06: the turn rows come from `posexplode(char_chunks(vtext))` —
    * one fused pass per doc ([[Chunks]]) — instead of
    * `explode(sequence(0, ceil(len/w)-1))` + a per-turn `substring`
    * whose O(position) scan made the chunking O(len²/w) per doc.
    * `pos` IS the former turn_idx (0-based, int) and the chunk the
    * former substring, including the empty-string → one-empty-turn and
    * null-text → one-null-turn edge cases (spec-tested equivalent;
    * the DuckDB oracle mirror below is unchanged). */
  def turns(spark: SparkSession, sfDir: String, variants: Int = 3): Dataset[Turn] = {
    import spark.implicits._
    convDocs(spark, sfDir, variants)
      .select(col("conv_id"), col("entity_id"), col("variant"),
        posexplode(org.apache.spark.sql.GraftShim.column(
          Chunks(org.apache.spark.sql.GraftShim.expression(col("vtext")), ChunkSize)))
          .as(Seq("turn_idx", "text")))
      .select(
        col("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        expr(s"CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END")
          .as("role"),
        col("text"),
        expr(
          s"""CASE WHEN turn_idx % 3 = 2 THEN
             |  ${toolCaseSql("(entity_id * 7 + turn_idx * 5 + variant)")}
             |ELSE NULL END""".stripMargin).as("tool"),
        expr(s"timestamp'$Epoch' + make_interval(0,0,0,0,0,0, entity_id * 1000 + variant * 100 + turn_idx)")
          .as("ts"))
      // Pinned hash partitioning on conv_id (r06): the dominant
      // consumers re-assemble conversations (groupBy(conv_id) in
      // convNorm/convNormV, the tool-sequence fold) — emitting turns
      // already clustered by conv_id lets EnsureRequirements elide the
      // aggregation's own exchange, so the same turn bytes cross the
      // network once either way, but the explicit partition count is
      // NOT AQE-coalesced: the r05 shape let AQE squeeze the ~200 MB
      // post-groupBy stage into a handful of tasks sized for shuffle
      // bytes, serializing the normalize chain (the stage's real cost,
      // invisible to byte-based coalescing) onto 2-4 cores. Count is
      // cores-tracking ([[graft.util.Parallelism.spread]]) — scale-
      // adaptive, not a local constant; the downstream aggregation
      // accepts any hash-partitioning on conv_id, so no re-exchange.
      .repartition(graft.util.Parallelism.spread(spark), col("conv_id"))
      .as[Turn]
  }

  private def toolCaseSql(keyExpr: String): String = {
    val whens = toolSpellings.zipWithIndex
      .map { case ((dirty, _), i) => s"WHEN $i THEN '$dirty'" }
      .mkString(" ")
    s"CASE $keyExpr % ${toolSpellings.size} $whens END"
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle mirror
  // ---------------------------------------------------------------------

  /** DuckDB CTEs replaying [[convDocs]] + [[turns]] bit-for-bit: defines
    * `conv_docs(conv_id, entity_id, variant, vtext)` and
    * `transcripts(conv_id, turn_idx, role, text, tool, ts)`. Prepend to
    * oracle SQL as `WITH $transcriptsCte SELECT ...`. */
  def oracleCte(variants: Int = 3): String = {
    s"""conv_docs AS (
       |  SELECT 'c' || CAST(doc_id AS VARCHAR) || '_' || CAST(variant AS VARCHAR) AS conv_id,
       |         doc_id AS entity_id, variant,
       |         CASE
       |           WHEN variant = 0 THEN text
       |           WHEN variant = 1 THEN
       |             replace(replace(replace(replace(replace(text,
       |               ' merge ', ' mrg. '), ' window ', ' wnd '),
       |               ' stream ', ' strm. '), ' customer ', ' cust '),
       |               ' the ', ' ')
       |           WHEN variant = 2 THEN upper(replace(text, ' ', ' , '))
       |           ELSE upper(replace(text, ' ', ' , ')) || ' v' || CAST(variant AS VARCHAR)
       |         END AS vtext
       |  FROM documents, (SELECT unnest(generate_series(0, ${variants - 1})) AS variant)
       |),
       |transcripts AS (
       |  SELECT conv_id,
       |         CAST(k AS INT) AS turn_idx,
       |         CASE k % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       |         substring(vtext, CAST(k AS INT) * $ChunkSize + 1, $ChunkSize) AS text,
       |         CASE WHEN k % 3 = 2 THEN
       |           ${toolCaseSql("(entity_id * 7 + k * 5 + variant)")}
       |         ELSE NULL END AS tool,
       |         TIMESTAMP '$Epoch' + to_seconds(entity_id * 1000 + variant * 100 + k) AS ts
       |  FROM (
       |    SELECT *, unnest(generate_series(0,
       |      GREATEST(CAST(ceil(length(vtext) / $ChunkSize.0) AS BIGINT) - 1, 0))) AS k
       |    FROM conv_docs
       |  )
       |)""".stripMargin
  }
}

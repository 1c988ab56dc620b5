package graft.pipeline

import graft.cluster.ConnectedComponents
import graft.io.TableIO
import graft.matching.{MatchConfig, Matcher}
import graft.normalize.Normalizer
import graft.transcripts.Transcripts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end record-linkage pipeline over transcript tables —
  * the Spark rebuild of run_pipeline.py's normalize → match → preview
  * flow (SURVEY.md §3.1) plus the north-rule clustering stage:
  *
  *   turns → conv docs (stable (conv_id, turn_idx) order) → normalize →
  *   [hot-key statistic] → block → score → threshold/topk → matches →
  *   connected components → clusters, with every stage committed as a
  *   TableIO snapshot so the whole pipeline resumes idempotently from
  *   the last committed stage (the reference's per-process CSV handoff,
  *   upgraded to atomic snapshot tables).
  *
  * The `hot_keys` stage is the per-snapshot table statistic the scale
  * story depends on: the block-key histogram's hot set is computed ONCE
  * when the normalize snapshot commits and fed to every subsequent
  * match over that snapshot as a DataFrame
  * ([[MatchConfig.knownHotKeysDf]]) — the match stage then salts
  * exactly those keys with no in-query detection scan and no driver
  * round-trip anywhere in the path.
  */
object Pipeline {

  case class StageResult(table: String, rows: Long, resumed: Boolean)
  case class Result(
      stages: Seq[StageResult],
      matches: DataFrame,
      clusters: DataFrame,
      golden: DataFrame)

  /** The match-stage DataFrame exactly as [[run]] computes it: salted
    * with the committed hot-key statistic when the config salts and no
    * explicit hot set was supplied. Exposed so specs can assert the
    * production plan shape (broadcast hot flag fed by the snapshot
    * scan, no detection aggregates). */
  def matchStageDf(
      convNorm: DataFrame, cfg: MatchConfig,
      hotKeys: Option[DataFrame]): DataFrame = {
    val matchCfg =
      if (cfg.saltBuckets > 1 && cfg.knownHotKeys.isEmpty && cfg.knownHotKeysDf.isEmpty)
        cfg.copy(knownHotKeysDf = hotKeys)
      else cfg
    Matcher.matchPairs(
      convNorm.filter(col("variant") === 0),
      convNorm.filter(col("variant") > 0),
      matchCfg, idCol = "conv_id", textCol = "text_norm")
  }

  def run(
      spark: SparkSession,
      sfDir: String,
      workRoot: String,
      cfg: MatchConfig = MatchConfig.reference,
      variants: Int = 3): Result = {
    val cfgHash = TableIO.lineageHash(Map(
      "scorer" -> cfg.scorer, "threshold" -> cfg.threshold.toString,
      "topk" -> cfg.topk.toString, "block" -> cfg.blockBy,
      "salt" -> cfg.saltBuckets.toString, "saltHot" -> cfg.saltHotPairs.toString,
      "variants" -> variants.toString))
    def lineage(stage: String, extra: (String, String)*): Map[String, String] =
      Map("input" -> sfDir, "stage" -> stage, "config" -> cfgHash) ++ extra

    val (convNorm, r1) = TableIO.resumeOrCompute(spark, workRoot, "conv_norm",
      lineage("conv_norm")) {
      Transcripts.turns(spark, sfDir, variants).toDF()
        .groupBy(col("conv_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"), col("text")))),
          x => x.getField("text")), "").as("doc"))
        .select(
          col("conv_id"),
          regexp_extract(col("conv_id"), "c([0-9]+)_", 1).cast("bigint").as("entity_id"),
          regexp_extract(col("conv_id"), "_([0-9]+)$", 1).cast("int").as("variant"),
          Normalizer.normalize(col("doc")).as("text_norm"))
    }

    // normalize-commit-time statistic: hot block keys of THIS snapshot,
    // as a snapshot table of their own (a DataFrame end to end — no
    // collect in the production path). Only computed when the match
    // stage will actually salt with it: on a non-salting config the
    // two full-corpus histogram aggregations would be pure waste.
    val needsHotKeys =
      cfg.saltBuckets > 1 && cfg.knownHotKeys.isEmpty && cfg.knownHotKeysDf.isEmpty
    val hotStage =
      if (needsHotKeys)
        Some(TableIO.resumeOrCompute(spark, workRoot, "hot_keys",
          lineage("hot_keys")) {
          Matcher.hotBlockKeysDf(
            convNorm.filter(col("variant") === 0),
            convNorm.filter(col("variant") > 0),
            cfg, textCol = "text_norm")
        })
      else None

    val (matches, r2) = TableIO.resumeOrCompute(spark, workRoot, "matches",
      lineage("matches")) {
      matchStageDf(convNorm, cfg, hotStage.map(_._1))
    }

    // CC returns an eager localCheckpoint (vertex-sized, pinned in
    // executor storage for the session). The snapshot commit below is
    // the durable copy, so free the checkpoint once committed —
    // without this, repeated pipeline runs in a long-lived session
    // accumulate one pinned vertex set per run.
    var ccResult: Option[DataFrame] = None
    val (clusters, r3) = TableIO.resumeOrCompute(spark, workRoot, "clusters",
      lineage("clusters")) {
      val r = ConnectedComponents.run(matches, "left_id", "right_id")
      ccResult = Some(r)
      r
    }
    ccResult.foreach(graft.util.CheckpointHygiene.free)

    // survivorship: one canonical record per entity cluster — the
    // pipeline's user-facing output table (GoldenRecord scaladoc).
    // Reads the committed clusters snapshot, so it resumes like any
    // other stage.
    val (golden, r4) = TableIO.resumeOrCompute(spark, workRoot, "golden",
      lineage("golden")) {
      graft.cluster.GoldenRecord.merge(
        convNorm.select(col("conv_id").as("id"), col("text_norm")),
        clusters, idCol = "id", textCol = "text_norm")
    }

    Result(
      Seq(StageResult("conv_norm", convNorm.count(), r1)) ++
        hotStage.map { case (df, resumed) =>
          StageResult("hot_keys", df.count(), resumed)
        } ++
        Seq(
          StageResult("matches", matches.count(), r2),
          StageResult("clusters", clusters.count(), r3),
          StageResult("golden", golden.count(), r4)),
      matches, clusters, golden)
  }
}

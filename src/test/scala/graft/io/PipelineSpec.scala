package graft.io

import graft.SparkSpec
import graft.matching.{MatchConfig, Matcher}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The round-3 wiring check: the production pipeline feeds the match
  * stage from the COMMITTED hot-key snapshot statistic — no in-query
  * hot-key detection scan, no driver collect — and the output is
  * byte-identical to the detection path.
  */
class PipelineSpec extends SparkSpec {

  // salting config with a threshold low enough that sf0.001 has hot keys
  private val cfg = MatchConfig.reference.copy(saltBuckets = 4, saltHotPairs = 16L)

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("run() releases the CC result checkpoint once the clusters snapshot commits") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val root = Files.createTempDirectory("graft_pipe_free").toString
    Pipeline.run(spark, sf0001, root, cfg)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"pipeline run left RDDs pinned in executor storage: $leaked")
  }

  test("match stage salts from the snapshot statistic, not an in-query scan") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val res = Pipeline.run(spark, sf0001, root, cfg)
    assert(res.stages.map(_.table) ==
      Seq("conv_norm", "hot_keys", "matches", "clusters", "golden"))
    // every clustered record is represented in exactly one golden row
    assert(res.golden.agg(sum("n_members")).collect()(0).getLong(0) ==
      res.clusters.count())
    val hotRows = res.stages.find(_.table == "hot_keys").get.rows
    assert(hotRows > 0, "expected hot keys at this salt threshold")

    // rebuild the match stage exactly as run() does, from the committed
    // snapshots, and check the plan
    val convNorm = TableIO.readTable(spark, root, "conv_norm")
    val hotKeys = TableIO.readTable(spark, root, "hot_keys")
    val m = Pipeline.matchStageDf(convNorm, cfg, Some(hotKeys))
    val p = plan(m)
    assert(p.contains("Broadcast"), s"hot-key flag not broadcast:\n$p")
    // the snapshot-statistic path has no detection aggregates: the
    // in-query scan's count columns (nl/nr) must be absent
    assert(!p.contains("nl#") && !p.contains("nr#"),
      s"in-query hot-key detection scan still present:\n$p")
    // the broadcast side is fed by the hot_keys snapshot's parquet scan
    assert(p.contains("hot_keys"), s"hot_keys snapshot not in the plan:\n$p")

    // and the statistic-fed path is semantically identical to detection
    val lhs = convNorm.filter(col("variant") === 0)
    val rhs = convNorm.filter(col("variant") > 0)
    val viaDetection = Matcher.matchPairs(lhs, rhs, cfg,
      idCol = "conv_id", textCol = "text_norm")
    assert(m.exceptAll(viaDetection).isEmpty && viaDetection.exceptAll(m).isEmpty,
      "snapshot-statistic match differs from detection-path match")
  }
}

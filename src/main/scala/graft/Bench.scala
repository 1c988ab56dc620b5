package graft

import graft.cluster.ConnectedComponents
import graft.fixtures.AddressFixture
import graft.matching.{MatchConfig, Matcher}
import graft.normalize.Normalizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs the headline pipelines on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}` plus
  * extra fields the driver can ignore:
  *   - "scored_pairs" / "pairs_per_sec": candidate-pair scoring
  *     throughput of the flagship match (BASELINE.md target metric)
  *   - with SPARK_GRAFT_SCALING=1 (or --scaling): the same match job is
  *     re-run at local[8] and local[32] on identical input and the
  *     throughput at both parallelism levels + scaling efficiency is
  *     reported (the sandbox stand-in for N vs 4N executors — see
  *     BASELINE.md).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // fixed partition count across core counts: identical plans and
      // key->partition mapping, so the scaling comparison measures
      // parallelism, not partitioning differences; 256 also keeps the
      // skewed block-join balanced at 32 cores
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The flagship job: transcript conv docs (6 variants at bench scale)
    * -> normalize -> block -> token_set_ratio score -> threshold/topk.
    * Returns the matches DataFrame; `candidatePairs` counts the scored
    * (post-block, pre-threshold) pairs the same plan evaluates. */
  private def transcriptMatch(s: SparkSession, dir: String): DataFrame = {
    val conv = SparkEntryBench.convNormV(s, dir, variants = 12)
    Matcher.matchPairs(
      conv.filter(col("variant") === 0),
      conv.filter(col("variant") > 0),
      MatchConfig.reference.copy(saltBuckets = 8),
      idCol = "conv_id", textCol = "text_norm")
  }

  private def transcriptCandidates(s: SparkSession, dir: String): Long = {
    val conv = SparkEntryBench.convNormV(s, dir, variants = 12)
      .withColumn("bk", graft.blocking.BlockKeys.blockKey(col("text_norm"), "digits+prefix6"))
    conv.filter(col("variant") === 0).select(col("bk"))
      .join(conv.filter(col("variant") > 0).select(col("bk")), Seq("bk"))
      .count()
  }

  private def addrCandidates(s: SparkSession, dir: String): Long = {
    def side(df: DataFrame) = df
      .withColumn("t", Normalizer.normalizeAddress(col("address")))
      .withColumn("bk", graft.blocking.BlockKeys.blockKey(col("t"), "digits+prefix6"))
      .select("bk")
    side(AddressFixture.left(s, dir))
      .join(side(AddressFixture.rightAll(s, dir)), Seq("bk")).count()
  }

  /** addr match with 8-way salting — same semantics as
    * SparkEntry.addrMatchLev (equivalence is tested), hot blocks split. */
  private def addrMatchSalted(s: SparkSession, dir: String): DataFrame =
    Matcher.matchPairs(
      SparkEntry.addrNorm(AddressFixture.left(s, dir)),
      SparkEntry.addrNorm(AddressFixture.rightAll(s, dir)),
      MatchConfig(scorer = "lev_ratio", threshold = 75, topk = 3,
        blockBy = "digits+prefix6", wDigits = 0.15, wGeo = 0.05,
        geoMaxKm = 1.5, saltBuckets = 8),
      idCol = "id", textCol = "address_norm", hasGeo = true)

  private def queriesFor(s: SparkSession, dir: String): Seq[(String, () => Long)] = Seq(
    "match_transcripts_tsr" -> (() => transcriptMatch(s, dir).count()),
    "match_addr_lev" -> (() => addrMatchSalted(s, dir).count()),
    "clusters_cc" -> (() =>
      ConnectedComponents.run(addrMatchSalted(s, dir), "left_id", "right_id").count()),
    "minhash_dedup" -> (() => ExtraQueries.queries("d_minhash_pairs")(s, dir).count()),
    "ann_brute" -> (() => ExtraQueries.queries("v_ann_brute")(s, dir).count()))

  /** One matched-pipeline throughput measurement at a given core count:
    * (candidate pairs scored, seconds, pairs/sec). Runs twice, keeps the
    * faster (JIT/page-cache warm). */
  private def matchThroughput(cores: Int, dir: String): (Long, Double, Double) = {
    val s = session(cores)
    try {
      val cands = transcriptCandidates(s, dir) + addrCandidates(s, dir)
      def job(): Long =
        transcriptMatch(s, dir).count() + addrMatchSalted(s, dir).count()
      job() // warmup
      val (_, t1) = time(job())
      val (_, t2) = time(job())
      val sec = math.min(t1, t2)
      (cands, sec, cands / sec)
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaling = args.contains("--scaling") ||
      sys.env.get("SPARK_GRAFT_SCALING").contains("1")

    val s = session(cpus)
    val results = queriesFor(s, dir).map { case (name, job) =>
      val (_, sec) = time(job())
      name -> sec
    }
    val cands = transcriptCandidates(s, dir) + addrCandidates(s, dir)
    val (_, matchSec) = time {
      transcriptMatch(s, dir).count() + addrMatchSalted(s, dir).count()
    }
    s.stop()

    val scalingJson = if (scaling) {
      val (c8, t8, r8) = matchThroughput(8, dir)
      val (_, t32, r32) = matchThroughput(32, dir)
      val eff = (t8 / t32) / 4.0
      f""","scaling":{"pairs":$c8,"local8_sec":$t8%.3f,"local8_pairs_per_sec":$r8%.0f,"local32_sec":$t32%.3f,"local32_pairs_per_sec":$r32%.0f,"speedup":${t8 / t32}%.3f,"efficiency":$eff%.3f}"""
    } else ""

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$dir","scored_pairs":$cands,"match_sec":$matchSec%.3f,"pairs_per_sec":${cands / matchSec}%.0f$scalingJson}""")
  }
}

/** Bench-scale variants of SparkEntry helpers (more duplicate variants
  * per entity => realistic scored-pair volume). */
object SparkEntryBench {
  def convNormV(s: SparkSession, dir: String, variants: Int): DataFrame =
    graft.transcripts.Transcripts.turns(s, dir, variants).toDF()
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

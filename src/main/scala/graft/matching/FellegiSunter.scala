package graft.matching

import graft.blocking.BlockKeys
import graft.similarity.Scores
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage (J27) — the classical
  * probabilistic model behind modern linkage engines: per-field
  * agreement levels (comparison vector γ), per-level match/non-match
  * likelihoods m_k/u_k and a match prevalence λ estimated by
  * unsupervised EM over the candidate pairs, and a per-pair match
  * posterior P(match | γ). The reference's matcher is a hand-weighted
  * score combiner (scoring/confidence.py:40-60 — fixed 0.8/0.15/0.05
  * weights); Fellegi-Sunter LEARNS the weights from the data itself,
  * which is the standard upgrade when no labels exist.
  *
  * Scale shape (the Splink production pattern): the only data-sized
  * work is (1) candidate generation — any [[Matcher]] generator:
  * block join, LSH bands, sorted neighborhood — and (2) ONE groupBy
  * collapsing billions of pairs to ≤ Π|levels| = 18 gamma-pattern
  * counts (map-side partial aggregation makes the reduce input tiny).
  * EM then iterates over the 18-row pattern table — O(patterns) per
  * iteration, independent of data size — and scoring is a broadcast
  * join of the learned 1-row parameter table back onto the pairs
  * (map-side, codegen'd arithmetic). Nothing touches the driver.
  *
  * Determinism (the oracle contract): EM responsibilities are
  * QUANTIZED to a fixed 1e-6 grid each iteration
  * (`wq = round(w·10⁶) :: bigint`), so every EM aggregate is an exact
  * integer sum — associative, order-independent, identical under any
  * partitioning and any engine. The double arithmetic between
  * aggregates (products, quotients, the final posterior) is IEEE-754
  * with operation shapes mirrored 1:1 in the DuckDB SQL builders
  * below, so `fs_em_params` / `fs_em_match` hash-match bit-for-bit.
  * (A float-summed EM would be order-dependent and unverifiable;
  * the 1e-6 grid costs ~1e-6 absolute parameter precision, far below
  * EM's own statistical noise.)
  */
object FellegiSunter {

  /** E-step responsibility grid: w is kept as round(w·1e6) ∈ [0, 1e6]. */
  val Quant: Long = 1000000L

  /** γ binning thresholds + EM initialization. Defaults give 3 text
    * levels (strong/weak/none agreement), 2 digit levels, 3 geo levels.
    * Init values are intentionally NOT dyadic rationals (0.5, 0.25…):
    * full-width binary expansions keep the 1e-6 rounding off exact
    * .5-tie boundaries from the very first iteration. */
  case class FsConfig(
      iters: Int = 5,
      textLo: Double = 60.0,
      textHi: Double = 85.0,
      geoLo: Double = 40.0,
      geoHi: Double = 80.0,
      geoMaxKm: Double = 1.5,
      lambda0: Double = 0.1,
      mT: Seq[Double] = Seq(0.05, 0.15, 0.8),
      uT: Seq[Double] = Seq(0.7, 0.2, 0.1),
      mD: Seq[Double] = Seq(0.1, 0.9),
      uD: Seq[Double] = Seq(0.9, 0.1),
      mG: Seq[Double] = Seq(0.2, 0.3, 0.5),
      uG: Seq[Double] = Seq(0.6, 0.3, 0.1),
      posteriorThreshold: Double = 0.5) {
    def init(tag: String, m: Boolean): Seq[Double] = (tag, m) match {
      case ("t", true) => mT; case ("t", false) => uT
      case ("d", true) => mD; case ("d", false) => uD
      case ("g", true) => mG; case ("g", false) => uG
      case other => throw new IllegalArgumentException(other.toString)
    }
  }

  /** The comparison-vector fields: γ column, level count, param tag. */
  private case class Field(gcol: String, n: Int, tag: String)
  private val fields = Seq(Field("g_t", 3, "t"), Field("g_d", 2, "d"), Field("g_g", 3, "g"))

  // -------------------------------------------------------------------
  // Candidate comparison vectors
  // -------------------------------------------------------------------

  /** Blocked candidate pairs → comparison vectors (left_id, right_id,
    * g_t, g_d, g_g). Same shuffle discipline as [[Matcher.scoredPairs]]:
    * slim (id, text, block_key, geo) projection shuffles; digit runs
    * are derived per shuffled ROW post-exchange. `scorer` is any 0-100
    * text scorer from [[graft.similarity.FuzzFunctions.scorers]].
    * For skewed corpora, generate candidates with a salted/LSH
    * [[Matcher]] path instead and call [[gammasFromScores]]. */
  def gammaPairs(
      left: DataFrame,
      right: DataFrame,
      cfg: FsConfig,
      blockBy: String,
      scorer: (Column, Column) => Column,
      idCol: String = "id",
      textCol: String = "text",
      hasGeo: Boolean = false): DataFrame = {
    def prepped(df: DataFrame, side: String): DataFrame =
      df.withColumn("block_key", BlockKeys.blockKey(col(textCol), blockBy))
        .select(Seq(col(idCol).as(s"${side}_id"), col(textCol).as(s"${side}_t"),
          col("block_key")) ++
          (if (hasGeo) Seq(col("lat").as(s"${side}_lat"), col("lon").as(s"${side}_lon"))
           else Nil): _*)
    val parts = left.sparkSession.sessionState.conf.numShufflePartitions
    def heavy(df: DataFrame, side: String): DataFrame =
      df.withColumn(s"${side}_runs", Scores.digitRuns(col(s"${side}_t")))
    val joined = heavy(prepped(left, "left").repartition(parts, col("block_key")), "left")
      .join(heavy(prepped(right, "right").repartition(parts, col("block_key")), "right"),
        Seq("block_key"), "inner")
    val ts = scorer(col("left_t"), col("right_t"))
    val ds = Scores.digitsScoreArrays(col("left_runs"), col("right_runs"))
    val gs: Column =
      if (hasGeo) {
        val d = Scores.haversineKm(col("left_lat"), col("left_lon"),
          col("right_lat"), col("right_lon"))
        when(col("left_lat").isNotNull && col("left_lon").isNotNull &&
          col("right_lat").isNotNull && col("right_lon").isNotNull,
          Scores.geoScoreKm(d, cfg.geoMaxKm))
      } else lit(null).cast("double")
    joined.select(
      Seq(col("left_id"), col("right_id")) ++ gammasFromScores(ts, ds, gs, cfg): _*)
  }

  /** [[gammaPairs]] for TEXT-ONLY corpora (no geo, no digit field
    * worth comparing — e.g. transcript documents, where digit runs are
    * part of the mutated text and the run-equality field is constant
    * 0): γ_t bins `scorer` as usual, γ_g stays level 0, and γ_d is
    * re-purposed as the classic FS EXACT-AGREEMENT indicator — level 1
    * iff the two token SETS are identical (`token_set_ratio == 100`).
    * A one-field γ (γ_t alone) makes the two-class EM unidentifiable
    * (2 observed degrees of freedom vs 5 free parameters — the fit
    * drifts with the init); the exact-agreement field is informative
    * precisely where the graded similarity saturates, which restores a
    * near-deterministic anchor pattern for the M class. */
  def gammaPairsText(
      left: DataFrame,
      right: DataFrame,
      cfg: FsConfig,
      blockBy: String,
      scorer: (Column, Column) => Column,
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    def prepped(df: DataFrame, side: String): DataFrame =
      df.withColumn("block_key", BlockKeys.blockKey(col(textCol), blockBy))
        .select(col(idCol).as(s"${side}_id"), col(textCol).as(s"${side}_t"),
          col("block_key"))
    val parts = left.sparkSession.sessionState.conf.numShufflePartitions
    val joined = prepped(left, "left").repartition(parts, col("block_key"))
      .join(prepped(right, "right").repartition(parts, col("block_key")),
        Seq("block_key"), "inner")
    val ts = scorer(col("left_t"), col("right_t"))
    val exact = graft.similarity.FuzzFunctions
      .scorer("token_set_ratio")(col("left_t"), col("right_t"))
    joined.select(
      Seq(col("left_id"), col("right_id")) ++
        gammasFromScores(ts, when(exact === 100.0, 100.0).otherwise(0.0),
          lit(null).cast("double"), cfg): _*)
  }

  /** Bin per-field 0-100 scores to agreement levels. Null geo (either
    * side missing coordinates) falls to level 0 — "no evidence" and
    * "disagree" share a level, the standard 3-level treatment. */
  def gammasFromScores(text: Column, digits: Column, geo: Column, cfg: FsConfig): Seq[Column] =
    Seq(
      when(text >= cfg.textHi, 2).when(text >= cfg.textLo, 1).otherwise(0).as("g_t"),
      when(digits === 100.0, 1).otherwise(0).as("g_d"),
      when(geo >= cfg.geoHi, 2).when(geo >= cfg.geoLo, 1).otherwise(0).as("g_g"))

  /** Pattern histogram: the ONE data-sized aggregation. ≤ 18 rows out. */
  def gammaCounts(gammas: DataFrame): DataFrame =
    gammas.groupBy("g_t", "g_d", "g_g").agg(count(lit(1)).as("cnt"))

  // -------------------------------------------------------------------
  // EM over the pattern table
  // -------------------------------------------------------------------

  /** λ·Πm (resp. (1-λ)·Πu) with the per-level param selected by a
    * when-chain — the SQL builder below mirrors this shape token for
    * token (left-associated products, CASE per field). */
  private def likeli(m: Boolean): Column = {
    val base = if (m) col("lambda") else lit(1.0) - col("lambda")
    fields.foldLeft(base) { (acc, f) =>
      val p = (if (m) "m_" else "u_") + f.tag
      val sel = (1 until f.n - 1).foldLeft(when(col(f.gcol) === 0, col(s"${p}0"))) {
        (w, l) => w.when(col(f.gcol) === l, col(s"$p$l"))
      }.otherwise(col(s"$p${f.n - 1}"))
      acc * sel
    }
  }

  /** CONDITIONAL pattern likelihood Πm = P(γ|M) (resp. Πu = P(γ|U)) —
    * [[likeli]] without the λ base; starts the left-associated product
    * at 1.0 so the SQL mirror reproduces the op shape exactly. */
  private def likeliCond(m: Boolean): Column =
    fields.foldLeft(lit(1.0): Column) { (acc, f) =>
      val p = (if (m) "m_" else "u_") + f.tag
      val sel = (1 until f.n - 1).foldLeft(when(col(f.gcol) === 0, col(s"${p}0"))) {
        (w, l) => w.when(col(f.gcol) === l, col(s"$p$l"))
      }.otherwise(col(s"$p${f.n - 1}"))
      acc * sel
    }

  private def paramNames: Seq[String] =
    "lambda" +: fields.flatMap(f =>
      (0 until f.n).flatMap(l => Seq(s"m_${f.tag}$l", s"u_${f.tag}$l")))

  /** Unsupervised EM fit: `counts` is [[gammaCounts]] output; returns a
    * 1-row DataFrame with columns λ, m_t0..2, u_t0..2, m_d0..1,
    * u_d0..1, m_g0..2, u_g0..2. Per-level params are floored at 1e-9
    * (standard smoothing: a level with zero posterior weight would
    * zero every product it appears in). Fixed iteration count — EM on
    * ≤18 patterns converges in a handful of steps and a fixed count
    * keeps the result (and its oracle) closed-form. */
  def emFit(counts: DataFrame, cfg: FsConfig = FsConfig()): DataFrame = {
    val spark = counts.sparkSession
    var params: DataFrame = spark.range(1).select(
      lit(cfg.lambda0).as("lambda") +:
        fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
          lit(cfg.init(f.tag, m = true)(l)).as(s"m_${f.tag}$l"),
          lit(cfg.init(f.tag, m = false)(l)).as(s"u_${f.tag}$l")))): _*)
    for (_ <- 1 to cfg.iters) {
      val e = counts.crossJoin(broadcast(params))
        .withColumn("pm", likeli(m = true))
        .withColumn("pu", likeli(m = false))
        .withColumn("wq",
          round((col("pm") / (col("pm") + col("pu"))) * lit(1000000.0), 0).cast("long"))
      val mw = col("cnt") * col("wq")
      val uw = col("cnt") * (lit(Quant) - col("wq"))
      def lvl(g: String, l: Int, c: Column): Column =
        sum(when(col(g) === l, c).otherwise(lit(0L)))
      val agged = e.agg(
        sum(mw).as("S"),
        sum(uw).as("U") +:
          fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
            lvl(f.gcol, l, mw).as(s"S_${f.tag}$l"),
            lvl(f.gcol, l, uw).as(s"U_${f.tag}$l")))): _*)
      params = agged.select(
        (col("S").cast("double") / (col("S") + col("U")).cast("double")).as("lambda") +:
          fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
            greatest(col(s"S_${f.tag}$l").cast("double") / col("S").cast("double"),
              lit(1e-9)).as(s"m_${f.tag}$l"),
            greatest(col(s"U_${f.tag}$l").cast("double") / col("U").cast("double"),
              lit(1e-9)).as(s"u_${f.tag}$l")))): _*)
    }
    params
  }

  /** Score pairs with learned params: broadcast the 1-row param table,
    * posterior = λΠm / (λΠm + (1-λ)Πu), keep pairs at or above the
    * threshold. Map-side only — no shuffle. */
  def matchPosteriors(
      gammas: DataFrame,
      params: DataFrame,
      threshold: Double = 0.5): DataFrame =
    gammas.crossJoin(broadcast(params))
      .withColumn("pm", likeli(m = true))
      .withColumn("pu", likeli(m = false))
      .withColumn("posterior", col("pm") / (col("pm") + col("pu")))
      .filter(col("posterior") >= threshold)
      .select("left_id", "right_id", "g_t", "g_d", "g_g", "posterior")

  /** Fellegi–Sunter THREE-ZONE decision rule (FS 1969 Theorem 1 — the
    * part of the theory [[matchPosteriors]]' single posterior cut
    * skips): given target error rates μ (false-match: probability mass
    * of TRUE NON-MATCHES the link zone may absorb) and λ_err
    * (false-non-match: mass of TRUE MATCHES the non-link zone may
    * absorb), order the observed γ patterns by likelihood ratio
    * R = P(γ|M)/P(γ|U) descending and take
    *
    *   - LINK      — the longest top prefix with Σ P(γ|U) ≤ μ,
    *   - NON-LINK  — the longest bottom suffix with Σ P(γ|M) ≤ λ_err,
    *   - POSSIBLE  — everything between: the clerical-review zone,
    *
    * which FS prove is the optimal (minimal-review) rule at those
    * error levels. A pattern satisfying both prefix and suffix bounds
    * (overlapping zones at loose μ/λ) links — review stays empty.
    *
    * Everything happens on the ≤18-row pattern table: the windows run
    * on a constant-size frame (the pattern space is fixed by the γ
    * schema, NOT by data size — a deliberate SinglePartition over 18
    * rows), so the rule costs nothing at any corpus scale and pairs
    * join their zone by γ equality, map-side against a broadcast.
    * Ratio ties order by (g_t, g_d, g_g) DESC — deterministic and
    * mirrored; every double op keeps the Scala/SQL shape parity the
    * EM chain established, so zones are DuckDB-hashable.
    *
    * @return one row per observed pattern:
    *         (g_t, g_d, g_g, cnt, ratio, zone ∈ link|possible|nonlink)
    */
  def decisionZones(
      counts: DataFrame,
      params: DataFrame,
      mu: Double = 0.01,
      lambdaErr: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRatioDesc = Window.orderBy(col("ratio").desc,
      col("g_t").desc, col("g_d").desc, col("g_g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byRatioAsc = Window.orderBy(col("ratio").asc,
      col("g_t").asc, col("g_d").asc, col("g_g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(params))
      .withColumn("pm", likeliCond(m = true))
      .withColumn("pu", likeliCond(m = false))
      .withColumn("ratio", col("pm") / col("pu"))
      .withColumn("cum_u", sum(col("pu")).over(byRatioDesc))
      .withColumn("cum_m", sum(col("pm")).over(byRatioAsc))
      .withColumn("zone",
        when(col("cum_u") <= lit(mu), "link")
          .when(col("cum_m") <= lit(lambdaErr), "nonlink")
          .otherwise("possible"))
      .select(col("g_t"), col("g_d"), col("g_g"), col("cnt"),
        col("ratio"), col("zone"))
  }

  /** The clerical-review queue: pairs whose γ pattern falls in the
    * POSSIBLE zone of [[decisionZones]] — the set a production linkage
    * pipeline routes to human review. Zone lookup is a broadcast
    * equi-join on the constant-size pattern table; deterministic
    * output (pairs + pattern + ratio). */
  def reviewQueue(
      gammas: DataFrame,
      zones: DataFrame): DataFrame =
    gammas.join(broadcast(zones.filter(col("zone") === "possible")
        .select("g_t", "g_d", "g_g", "ratio")),
      Seq("g_t", "g_d", "g_g"))
      .select("left_id", "right_id", "g_t", "g_d", "g_g", "ratio")

  // -------------------------------------------------------------------
  // DuckDB mirrors (oracle SQL builders)
  // -------------------------------------------------------------------

  /** Mirror of [[gammasFromScores]] over score SQL fragments. */
  def gammasSqlDuck(ts: String, ds: String, gs: String, cfg: FsConfig): String =
    s"""CASE WHEN $ts >= CAST(${cfg.textHi} AS DOUBLE) THEN 2
       |     WHEN $ts >= CAST(${cfg.textLo} AS DOUBLE) THEN 1 ELSE 0 END AS g_t,
       |CASE WHEN $ds = CAST(100.0 AS DOUBLE) THEN 1 ELSE 0 END AS g_d,
       |CASE WHEN $gs >= CAST(${cfg.geoHi} AS DOUBLE) THEN 2
       |     WHEN $gs >= CAST(${cfg.geoLo} AS DOUBLE) THEN 1 ELSE 0 END AS g_g""".stripMargin
      .replaceAll("\n\\s*", " ")

  private def selSql(gcol: String, p: String, n: Int): String =
    "CASE " + (0 until n - 1).map(l => s"WHEN p.$gcol = $l THEN i.$p$l").mkString(" ") +
      s" ELSE i.$p${n - 1} END"

  private def likeliSql(m: Boolean): String = {
    val base = if (m) "i.lambda" else "(CAST(1.0 AS DOUBLE) - i.lambda)"
    fields.foldLeft(base) { (acc, f) =>
      s"($acc * (${selSql(f.gcol, (if (m) "m_" else "u_") + f.tag, f.n)}))"
    }
  }

  // Spark's `a * sel` is Multiply(a, CaseWhen) — parenthesize the CASE
  // itself too so both likelihoods read (((λ * Ct) * Cd) * Cg).
  // Exact-double literal printing: Double.toString round-trips, and
  // DuckDB parses E-notation straight to DOUBLE, so interpolated init
  // values land on identical bits.

  /** EM chain CTEs. Assumes a prior CTE `gam(left_id, right_id, g_t,
    * g_d, g_g)`; emits `, pat AS …, it0 …, e1 …, a1 …, it1 …` up to
    * `it{iters}` — the mirror of [[emFit]], with every double op in
    * the same shape and every aggregate an exact integer. */
  def emChainSqlDuck(cfg: FsConfig = FsConfig()): String = {
    val sb = new StringBuilder
    sb ++= ", pat AS (SELECT g_t, g_d, g_g, count(*) AS cnt FROM gam GROUP BY 1, 2, 3)"
    val init = ("CAST(" + cfg.lambda0 + " AS DOUBLE) AS lambda") +:
      fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
        s"CAST(${cfg.init(f.tag, m = true)(l)} AS DOUBLE) AS m_${f.tag}$l",
        s"CAST(${cfg.init(f.tag, m = false)(l)} AS DOUBLE) AS u_${f.tag}$l")))
    sb ++= s", it0 AS (SELECT ${init.mkString(", ")})"
    for (k <- 1 to cfg.iters) {
      sb ++= s""", e$k AS (
        | SELECT g_t, g_d, g_g, cnt,
        |   CAST(round((pm / (pm + pu)) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS wq
        | FROM (SELECT p.*, ${likeliSql(m = true)} AS pm, ${likeliSql(m = false)} AS pu
        |       FROM pat p CROSS JOIN it${k - 1} i))""".stripMargin.replaceAll("\n\\s*\\|", " ")
      val sums = Seq("sum(cnt * wq) AS S", "sum(cnt * (1000000 - wq)) AS U") ++
        fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
          s"sum(CASE WHEN ${f.gcol} = $l THEN cnt * wq ELSE 0 END) AS S_${f.tag}$l",
          s"sum(CASE WHEN ${f.gcol} = $l THEN cnt * (1000000 - wq) ELSE 0 END) AS U_${f.tag}$l")))
      sb ++= s", a$k AS (SELECT ${sums.mkString(", ")} FROM e$k)"
      val upd = "CAST(S AS DOUBLE) / CAST(S + U AS DOUBLE) AS lambda" +:
        fields.flatMap(f => (0 until f.n).flatMap(l => Seq(
          s"greatest(CAST(S_${f.tag}$l AS DOUBLE) / CAST(S AS DOUBLE), 1e-9) AS m_${f.tag}$l",
          s"greatest(CAST(U_${f.tag}$l AS DOUBLE) / CAST(U AS DOUBLE), 1e-9) AS u_${f.tag}$l")))
      sb ++= s", it$k AS (SELECT ${upd.mkString(", ")} FROM a$k)"
    }
    sb.toString
  }

  /** [[likeliCond]]'s mirror: the conditional product, left-associated
    * from CAST(1.0 AS DOUBLE) — same op shape as the Spark column. */
  private def likeliCondSql(m: Boolean): String =
    fields.foldLeft("CAST(1.0 AS DOUBLE)") { (acc, f) =>
      s"($acc * (${selSql(f.gcol, (if (m) "m_" else "u_") + f.tag, f.n)}))"
    }

  /** Mirror of [[decisionZones]]: CTE chain from `pat` + `it{iters}`
    * (both emitted by [[emChainSqlDuck]]); emits `, fsz AS (…)` whose
    * final shape is (g_t, g_d, g_g, cnt, ratio, zone). */
  def zonesCteSqlDuck(
      cfg: FsConfig = FsConfig(),
      mu: Double = 0.01,
      lambdaErr: Double = 0.01): String =
    s""", fszp AS (
       |  SELECT g_t, g_d, g_g, cnt, pm / pu AS ratio, pm, pu FROM (
       |    SELECT p.g_t, p.g_d, p.g_g, p.cnt,
       |           ${likeliCondSql(m = true)} AS pm,
       |           ${likeliCondSql(m = false)} AS pu
       |    FROM pat p CROSS JOIN it${cfg.iters} i)),
       |fsz AS (
       |  SELECT g_t, g_d, g_g, cnt, ratio,
       |         CASE WHEN cum_u <= CAST($mu AS DOUBLE) THEN 'link'
       |              WHEN cum_m <= CAST($lambdaErr AS DOUBLE) THEN 'nonlink'
       |              ELSE 'possible' END AS zone
       |  FROM (SELECT g_t, g_d, g_g, cnt, ratio,
       |          sum(pu) OVER (ORDER BY ratio DESC, g_t DESC, g_d DESC, g_g DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u,
       |          sum(pm) OVER (ORDER BY ratio ASC, g_t ASC, g_d ASC, g_g ASC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_m
       |        FROM fszp))""".stripMargin.replaceAll("\n\\s*\\|", " ")

  /** Final SELECT for the zones query. */
  def zonesSelectSqlDuck: String =
    "SELECT g_t, g_d, g_g, cnt, ratio, zone FROM fsz"

  /** Final SELECT for the review-queue query (mirror of
    * [[reviewQueue]] over `gam` + `fsz`). */
  def reviewSelectSqlDuck: String =
    s"""SELECT g.left_id, g.right_id, g.g_t, g.g_d, g.g_g, z.ratio
       |FROM gam g JOIN fsz z
       |  ON g.g_t = z.g_t AND g.g_d = z.g_d AND g.g_g = z.g_g
       |WHERE z.zone = 'possible'""".stripMargin.replaceAll("\n\\s*", " ")

  /** Final SELECT for the learned-parameter query. */
  def emParamsSelectSqlDuck(cfg: FsConfig = FsConfig()): String =
    s"SELECT ${paramNames.mkString(", ")} FROM it${cfg.iters}"

  /** Final SELECT for the posterior-match query (mirror of
    * [[matchPosteriors]]). */
  def emMatchSelectSqlDuck(cfg: FsConfig = FsConfig()): String =
    s"""SELECT left_id, right_id, g_t, g_d, g_g, pm / (pm + pu) AS posterior
       |FROM (SELECT g.*, ${likeliSql(m = true).replace("p.", "g.")} AS pm,
       |             ${likeliSql(m = false).replace("p.", "g.")} AS pu
       |      FROM gam g CROSS JOIN it${cfg.iters} i)
       |WHERE pm / (pm + pu) >= CAST(${cfg.posteriorThreshold} AS DOUBLE)""".stripMargin
      .replaceAll("\n\\s*", " ")
}

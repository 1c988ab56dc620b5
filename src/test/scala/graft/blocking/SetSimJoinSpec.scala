package graft.blocking

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join (J29): equality with the
  * brute-force all-pairs join (the no-false-negative guarantee, tested
  * end to end), pruning reality, determinism, and plan shape. */
class SetSimJoinSpec extends SparkSpec {

  /** Brute-force oracle: every cross pair with exact token-set
    * similarity ≥ t — same tokenization (distinct non-empty whitespace
    * tokens), any of the three supported functions. */
  private def brute(left: DataFrame, right: DataFrame, t: Double,
      sim: String = "jaccard"): DataFrame = {
    def sets(df: DataFrame, side: String) =
      MetaBlocking.membership(df, "id", "text")
        .groupBy(col("id").as(s"${side}_id"))
        .agg(collect_set(col("tok")).as(s"${side.head}_ts"))
    val interI = size(array_intersect(col("l_ts"), col("r_ts")))
    val inter = interI.cast("double")
    val la = size(col("l_ts"))
    val lb = size(col("r_ts"))
    val score = sim match {
      case "jaccard" => inter / (la + lb - interI).cast("double")
      case "cosine"  => inter / sqrt(la.cast("double") * lb.cast("double"))
      case _         => lit(2.0) * inter / (la + lb).cast("double")
    }
    sets(left, "left").crossJoin(sets(right, "right"))
      .select(col("left_id"), col("right_id"), score.as("score"))
      .filter(col("score") >= lit(t))
  }

  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("equals brute force on hand-built edge cases") {
    val l = df("l1" -> "a b c d", "l2" -> "x y", "l3" -> "", "l4" -> "q",
      "l5" -> "m n o p r s t u")
    val r = df("r1" -> "a b c e", "r2" -> "x y", "r3" -> "z", "r4" -> "q",
      "r5" -> "m n o p", "r6" -> "   ")
    for (t <- Seq(0.3, 0.5, 0.75, 1.0)) {
      val got = SetSimJoin.jaccardJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      val want = brute(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      assert(got == want, s"t=$t: got $got want $want")
    }
    // spot-check a known value: |{a,b,c,d} ∩ {a,b,c,e}| / |union| = 3/5
    val j = SetSimJoin.jaccardJoin(l, r, 0.5)
      .filter(col("left_id") === "l1" && col("right_id") === "r1")
      .collect()(0).getDouble(2)
    assert(j == 0.6)
  }

  test("equals brute force on random data across thresholds") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5",
      "mah", "kat", "blok", "d")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(7)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(60, "l"): _*)
    val r = df(rec(90, "r"): _*)
    for (t <- Seq(0.34, 0.6, 0.85)) {
      val got = SetSimJoin.jaccardJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      val want = brute(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      assert((want -- got).isEmpty, s"t=$t FALSE NEGATIVES: ${want -- got}")
      assert((got -- want).isEmpty, s"t=$t false positives: ${got -- want}")
    }
  }

  test("fixture: matches brute force; prefixes really prune; no cartesian") {
    val conv = graft.SparkEntry.convNorm(spark, sf0001)
      .withColumnRenamed("conv_id", "id").withColumnRenamed("text_norm", "text")
      .cache()
    val l = conv.filter(col("variant") === 0)
    val r = conv.filter(col("variant") > 0)
    val out = SetSimJoin.jaccardJoin(l, r, 0.5, "id", "text").cache()
    val got = out.collect().map(x => (x.getString(0), x.getString(1))).toSet
    val want = brute(l.select(col("id"), col("text")),
      r.select(col("id"), col("text")), 0.5)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty, "fixture should produce matches at t=0.5")
    // the plan is equi-joins end to end — prefix filtering is the
    // candidate bound, never a cross product
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "set-sim join must not plan a cartesian product")
    // the positional filter really prunes candidates, and candidates
    // are far fewer than the |L|×|R| cross space
    val withPos = SetSimJoin.candidates(l, r, 0.5, "jaccard",
      "id", "text", positional = true).count()
    val withoutPos = SetSimJoin.candidates(l, r, 0.5, "jaccard",
      "id", "text", positional = false).count()
    assert(withPos <= withoutPos)
    assert(withoutPos < l.count() * r.count(),
      "prefix filtering left the cross space unpruned")
    info(s"candidates: $withPos positional vs $withoutPos prefix-only " +
      s"(cross space ${l.count() * r.count()})")
    out.unpersist(); conv.unpersist()
  }

  test("positional filter is pruning-only: outputs identical on or off") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      (s"$p$i", Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(60, "l"): _*)
    val r = df(rec(80, "r"): _*)
    for (sim <- Seq("jaccard", "cosine", "dice"); t <- Seq(0.4, 0.7)) {
      val on = SetSimJoin.simJoin(l, r, t, sim, positional = true).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      val off = SetSimJoin.simJoin(l, r, t, sim, positional = false).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      assert(on == off, s"$sim t=$t: positional changed the result")
      assert(on == brute(l, r, t, sim).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet,
        s"$sim t=$t: differs from brute force")
    }
  }

  test("cosine and dice variants equal brute force (own prefix bounds)") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5",
      "mah", "kat", "blok", "d")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(7)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(50, "l"): _*)
    val r = df(rec(70, "r"): _*)
    for (sim <- Seq("cosine", "dice"); t <- Seq(0.45, 0.7)) {
      val got = SetSimJoin.simJoin(l, r, t, sim).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      val want = brute(l, r, t, sim).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      assert((want -- got).isEmpty, s"$sim t=$t FALSE NEGATIVES: ${want -- got}")
      assert(got == want, s"$sim t=$t: extras ${got -- want}")
    }
    // hand value: {a,b,c,d} vs {a,b,c,e}: cosine 3/4, dice 3/4
    val lx = df("x" -> "a b c d"); val rx = df("y" -> "a b c e")
    assert(SetSimJoin.simJoin(lx, rx, 0.5, "cosine").collect()(0).getDouble(2) == 0.75)
    assert(SetSimJoin.simJoin(lx, rx, 0.5, "dice").collect()(0).getDouble(2) == 0.75)
  }

  /** Independent driver-side reference for [[SetSimJoin.weightedCosineJoin]]:
    * same integer weight grid (max(1, scale/df)), plain Scala maps, all
    * pairs — no prefixes, no Spark. Same final-double arithmetic shape
    * (one division over exact longs) so scores compare exactly. */
  private def bruteWeighted(
      l: Seq[(String, String)], r: Seq[(String, String)], t: Double,
      scale: Long = 1000000L): Set[(String, String, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSet
    val lt = l.map { case (id, s) => id -> toks(s) }.filter(_._2.nonEmpty)
    val rt = r.map { case (id, s) => id -> toks(s) }.filter(_._2.nonEmpty)
    val dfq = (lt.flatMap(_._2) ++ rt.flatMap(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val w = dfq.map { case (k, c) => k -> math.max(1L, scale / c) }
    def nsq(ts: Set[String]) = ts.toSeq.map(x => w(x) * w(x)).sum
    (for {
      (lid, la) <- lt; (rid, rb) <- rt
      dot = (la intersect rb).toSeq.map(x => w(x) * w(x)).sum
      score = dot.toDouble / math.sqrt(nsq(la).toDouble * nsq(rb).toDouble)
      if score >= t
    } yield (lid, rid, score)).toSet
  }

  test("weighted cosine equals driver-side brute force across thresholds") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5",
      "mah", "kat", "blok", "d", "xk17", "qz9")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(7)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val lrows = rec(60, "l") :+ ("lE" -> "") :+ ("lQ" -> "qz9")
    val rrows = rec(90, "r") :+ ("rE" -> "   ") :+ ("rQ" -> "qz9")
    val l = df(lrows: _*); val r = df(rrows: _*)
    for (t <- Seq(0.5, 0.75, 0.9)) {
      val got = SetSimJoin.weightedCosineJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      val want = bruteWeighted(lrows, rrows, t)
      assert((want -- got).isEmpty, s"t=$t FALSE NEGATIVES: ${want -- got}")
      assert(got == want, s"t=$t: extras ${got -- want}")
    }
    // identical singleton rare token: exact score 1.0 survives any t
    assert(SetSimJoin.weightedCosineJoin(l, r, 1.0).collect()
      .exists(x => x.getString(0) == "lQ" && x.getString(1) == "rQ" &&
        x.getDouble(2) == 1.0))
  }

  test("weighted cosine: a rare shared token outweighs common filler") {
    // xk17 is shared and rare; the fillers are each common (df >= 10).
    val filler = (0 until 10).map(i => (s"fl$i", "f1 f2 f3 g1 g2 g3"))
    val l = df((filler :+ ("l1" -> "xk17 f1 f2 f3")): _*)
    val r = df((filler.map { case (id, s) => (s"r$id", s) } :+
      ("r1" -> "xk17 g1 g2 g3")): _*)
    val weighted = SetSimJoin.weightedCosineJoin(l, r, 0.85).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    val unweighted = SetSimJoin.simJoin(l, r, 0.85, "cosine").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(weighted.contains(("l1", "r1")),
      "idf weighting should surface the rare-token match")
    assert(!unweighted.contains(("l1", "r1")),
      "unweighted cosine of 1 shared / 4 tokens is far below 0.85")
  }

  /** Brute containment: every cross pair with |A∩B|/|A| >= t. */
  private def bruteContain(left: DataFrame, right: DataFrame, t: Double): DataFrame = {
    def sets(d: DataFrame, side: String) =
      MetaBlocking.membership(d, "id", "text")
        .groupBy(col("id").as(s"${side}_id"))
        .agg(collect_set(col("tok")).as(s"${side.head}_ts"))
    sets(left, "left").crossJoin(sets(right, "right"))
      .select(col("left_id"), col("right_id"),
        (size(array_intersect(col("l_ts"), col("r_ts"))).cast("double") /
          size(col("l_ts")).cast("double")).as("score"))
      .filter(col("score") >= lit(t))
  }

  test("containment join equals brute force; asymmetric by design") {
    val l = df("l1" -> "a b c d", "l2" -> "q", "l3" -> "", "l4" -> "x y z")
    val r = df("r1" -> "a b c e f g h i j k l m n o p", "r2" -> "q",
      "r3" -> "x y", "r4" -> "a b c d")
    for (t <- Seq(0.5, 0.75, 1.0)) {
      val got = SetSimJoin.containJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      val want = bruteContain(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
      assert(got == want, s"t=$t: missing=${want -- got} extra=${got -- want}")
    }
    // 3 of l1's 4 tokens sit inside the 15-token r1: score 0.75
    // exactly, no penalty for r1's extra length (the Jaccard contrast)
    val c = SetSimJoin.containJoin(l, r, 0.75).collect()
      .filter(x => x.getString(0) == "l1" && x.getString(1) == "r1")
    assert(c.length == 1 && c(0).getDouble(2) == 0.75)
    assert(SetSimJoin.jaccardJoin(l, r, 0.75).collect()
      .forall(x => !(x.getString(0) == "l1" && x.getString(1) == "r1")))
    // random sweep
    val rnd = new scala.util.Random(59)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def rec(n: Int, p: String, kMax: Int) = (0 until n).map { i =>
      (s"$p$i", Seq.fill(1 + rnd.nextInt(kMax))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val lr = df(rec(50, "l", 4): _*); val rr = df(rec(70, "r", 8): _*)
    for (t <- Seq(0.34, 0.67, 1.0)) {
      val got = SetSimJoin.containJoin(lr, rr, t).collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      val want = bruteContain(lr, rr, t).collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      assert((want -- got).isEmpty, s"t=$t FALSE NEGATIVES: ${want -- got}")
      assert(got == want, s"t=$t: extras ${got -- want}")
    }
  }

  test("weighted cosine and containment are partitioning-independent") {
    val rnd = new scala.util.Random(61)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      (s"$p$i", Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(30, "l"): _*); val r = df(rec(30, "r"): _*)
    def s3(d: DataFrame) = d.collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(s3(SetSimJoin.weightedCosineJoin(l, r, 0.6)) ==
      s3(SetSimJoin.weightedCosineJoin(l.repartition(13), r.repartition(3), 0.6)))
    assert(s3(SetSimJoin.containJoin(l, r, 0.6)) ==
      s3(SetSimJoin.containJoin(l.repartition(7), r.repartition(5), 0.6)))
  }

  test("round-4 variants: equi-join plans, prefixes genuinely prune") {
    val conv = graft.SparkEntry.convNorm(spark, sf0001)
      .withColumnRenamed("conv_id", "id").withColumnRenamed("text_norm", "text")
      .cache()
    val l = conv.filter(col("variant") === 0)
    val r = conv.filter(col("variant") > 0)
    val cross = l.count() * r.count()
    def check(tag: String, out: org.apache.spark.sql.DataFrame): Long = {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$tag must stay equi-joins end to end:\n$plan")
      val n = out.count()
      assert(n > 0, s"$tag: fixture should produce matches")
      assert(n < cross, s"$tag: no pruning at all?")
      n
    }
    check("wjac", SetSimJoin.weightedJaccardJoin(l, r, 0.97, "id", "text"))
    check("overlap", SetSimJoin.overlapJoin(l, r, 30, "id", "text"))
    check("ocoeff", SetSimJoin.overlapCoeffJoin(
      l.filter(md5(col("id")) < "08"), r, 0.9, "id", "text"))
    conv.unpersist()
  }

  test("overlap coefficient equals brute force; symmetric-containment semantics") {
    def bruteOc(l: DataFrame, r: DataFrame, t: Double): Set[(String, String, Double)] = {
      def sets(d: DataFrame, side: String) =
        MetaBlocking.membership(d, "id", "text")
          .groupBy(col("id").as(s"${side}_id"))
          .agg(collect_set(col("tok")).as(s"${side.head}_ts"))
      sets(l, "left").crossJoin(sets(r, "right"))
        .select(col("left_id"), col("right_id"),
          (size(array_intersect(col("l_ts"), col("r_ts"))).cast("double") /
            least(size(col("l_ts")), size(col("r_ts"))).cast("double")).as("score"))
        .filter(col("score") >= t)
        .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    }
    def got(l: DataFrame, r: DataFrame, t: Double) =
      SetSimJoin.overlapCoeffJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    // Hand-built: subset relationships score 1.0 in BOTH directions —
    // short-left-in-long-right AND long-left-containing-short-right —
    // exactly the pairs Jaccard at the same threshold drops.
    val l = df("l1" -> "a b", "l2" -> "a b c d e f g h", "l3" -> "x y z")
    val r = df("r1" -> "a b c d e f g h i j", "r2" -> "a b", "r3" -> "x q")
    val g = got(l, r, 0.9)
    assert(g == bruteOc(l, r, 0.9))
    assert(g.contains(("l1", "r1", 1.0))) // min side left, 5x longer right
    assert(g.contains(("l2", "r2", 1.0))) // min side right
    assert(!g.exists(p => p._1 == "l3" && p._2 == "r3")) // 1/2 < 0.9
    val jac = SetSimJoin.jaccardJoin(l, r, 0.9).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(!jac.contains(("l1", "r1")), "Jaccard must drop the size-skewed pair")
    // Random corpus across thresholds
    val rnd = new scala.util.Random(59)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5",
      "mah", "kat", "blok", "d")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(8)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val lr = df(rec(60, "l"): _*); val rr = df(rec(90, "r"): _*)
    for (t <- Seq(0.4, 0.67, 0.9)) {
      val gg = got(lr, rr, t); val w = bruteOc(lr, rr, t)
      assert((w -- gg).isEmpty, s"t=$t FALSE NEGATIVES: ${(w -- gg).take(5)}")
      assert((gg -- w).isEmpty, s"t=$t false positives: ${(gg -- w).take(5)}")
    }
    // partitioning invariance
    assert(got(lr.repartition(11), rr.repartition(3), 0.67) == got(lr, rr, 0.67))
  }

  test("weighted Jaccard equals driver-side brute force; weighting changes ranking") {
    // Independent driver-side brute force: same integer weight grid,
    // computed with plain Scala collections (no Spark expressions).
    def bruteWj(l: DataFrame, r: DataFrame, t: Double): Set[(String, String, Double)] = {
      def toks(d: DataFrame) = d.collect()
        .map(x => (x.getString(0), x.getString(1).split("\\s+").filter(_.nonEmpty).toSet))
      val lt = toks(l); val rt = toks(r)
      val df = (lt ++ rt).flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      def w(tok: String) = math.max(1L, 1000000L / df(tok))
      def mass(s: Set[String]) = s.toSeq.map(w).sum
      (for {
        (li, ls) <- lt; (ri, rs) <- rt
        sh = mass(ls.intersect(rs))
        un = mass(ls) + mass(rs) - sh
        if un > 0
        sc = sh.toDouble / un.toDouble
        if sc >= t
      } yield (li, ri, sc)).toSet
    }
    def got(l: DataFrame, r: DataFrame, t: Double) =
      SetSimJoin.weightedJaccardJoin(l, r, t).collect()
        .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    val rnd = new scala.util.Random(97)
    // xk17/qz9 deliberately NOT in the random vocab -> df 2, weight 5e5 each
    val vocab = Vector("the", "a", "of", "to", "and", // common filler
      "trace", "panel", "flux", "warp", "gyro")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(8)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(50, "l") :+ ("lq" -> "xk17 qz9 the a of to and"): _*)
    val r = df(rec(70, "r") :+ ("rq" -> "xk17 qz9"): _*)
    for (t <- Seq(0.35, 0.5, 0.8)) {
      val g = got(l, r, t); val w = bruteWj(l, r, t)
      assert((w -- g).isEmpty, s"t=$t FALSE NEGATIVES: ${(w -- g).take(5)}")
      assert((g -- w).isEmpty, s"t=$t false positives: ${(g -- w).take(5)}")
    }
    // weighting beats filler: lq shares only 2 of its 7 tokens with rq,
    // but those two are the rare identifiers — the weighted score must
    // dominate every all-filler pairing of lq (unweighted Jaccard 2/7
    // would NOT: a full filler subset scores higher by count)
    val all = bruteWj(l, r, 0.0).filter(_._1 == "lq")
    val rqScore = all.find(_._2 == "rq").get._3
    assert(all.filter(_._2 != "rq").forall(_._3 < rqScore),
      s"rare-identifier pair must outrank all filler pairs: rq=$rqScore, " +
        s"max other=${all.filter(_._2 != "rq").map(_._3).max}")
    // partitioning invariance (exact-integer masses -> bit equality)
    assert(got(l.repartition(11), r.repartition(3), 0.5) == got(l, r, 0.5))
  }

  test("overlap join equals brute force; integer semantics; short records drop") {
    // Brute: every cross pair with |A∩B| >= c (same distinct-token sets).
    def bruteOv(l: DataFrame, r: DataFrame, c: Int): Set[(String, String, Long)] = {
      def sets(d: DataFrame, side: String) =
        MetaBlocking.membership(d, "id", "text")
          .groupBy(col("id").as(s"${side}_id"))
          .agg(collect_set(col("tok")).as(s"${side.head}_ts"))
      sets(l, "left").crossJoin(sets(r, "right"))
        .select(col("left_id"), col("right_id"),
          size(array_intersect(col("l_ts"), col("r_ts"))).cast("bigint").as("overlap"))
        .filter(col("overlap") >= c)
        .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    }
    def got(l: DataFrame, r: DataFrame, c: Int) =
      SetSimJoin.overlapJoin(l, r, c).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    // Hand-built: no length normalization — a short and a long record
    // sharing c tokens qualify; records with < c tokens never can.
    val l = df("l1" -> "a b c", "l2" -> "a b", "l3" -> "", "l4" -> "p q r s")
    val r = df("r1" -> "a b c d e f g h i j k l m n o", "r2" -> "a b",
      "r3" -> "x", "r4" -> "q r s t")
    val g2 = got(l, r, 2)
    assert(g2 == bruteOv(l, r, 2))
    assert(g2.contains(("l1", "r1", 3L))) // 3 shared of a 15-token right
    assert(g2.contains(("l2", "r2", 2L)))
    assert(g2.contains(("l4", "r4", 3L)))
    assert(!g2.exists(_._1 == "l3"))
    assert(got(l, r, 4) == bruteOv(l, r, 4)) // empty: no pair shares 4
    assert(got(l, r, 4).isEmpty)
    // Random corpus across thresholds, incl. c larger than many records.
    val rnd = new scala.util.Random(83)
    val vocab = Vector("ank", "ist", "izm", "cad", "sok", "no", "12", "5",
      "mah", "kat", "blok", "d", "apt", "kt")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(9)
      (s"$p$i", Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val lr = df(rec(60, "l"): _*); val rr = df(rec(90, "r"): _*)
    for (c <- Seq(1, 2, 4, 6)) {
      val g = got(lr, rr, c); val w = bruteOv(lr, rr, c)
      assert((w -- g).isEmpty, s"c=$c FALSE NEGATIVES: ${(w -- g).take(5)}")
      assert((g -- w).isEmpty, s"c=$c false positives: ${(g -- w).take(5)}")
    }
    // Partitioning invariance (integer output → set equality exact).
    assert(got(lr.repartition(13), rr.repartition(3), 3) == got(lr, rr, 3))
  }

  test("partitioning-independent") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def rec(n: Int, p: String) = (0 until n).map { i =>
      (s"$p$i", Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val l = df(rec(30, "l"): _*)
    val r = df(rec(30, "r"): _*)
    val a = SetSimJoin.jaccardJoin(l, r, 0.5).collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    val b = SetSimJoin.jaccardJoin(l.repartition(13), r.repartition(3), 0.5)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(a == b)
  }
}

package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-record survivorship (A15): rule semantics on hand-built
  * clusters, tie-breaks, fixture sanity, partitioning invariance. */
class GoldenRecordSpec extends SparkSpec {

  private def recs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }
  private def asg(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "component")
  }

  test("majority vote, most-complete, min-id handle") {
    val r = recs(
      "a1" -> "ankara merkez", "a2" -> "ankara merkez", "a3" -> "ank mrk uzun cadde",
      "b1" -> "izmir")
    val a = asg("a1" -> 1L, "a2" -> 1L, "a3" -> 1L, "b1" -> 2L)
    val got = GoldenRecord.merge(r, a).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getString(3), x.getString(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a1", 3L, "ankara merkez", "ank mrk uzun cadde"),
      (2L, "b1", 1L, "izmir", "izmir")))
  }

  test("tie-breaks are lexicographic on both rules") {
    // two values with equal frequency AND equal length
    val r = recs("x1" -> "bbb", "x2" -> "aaa", "x3" -> "bbb", "x4" -> "aaa")
    val a = asg("x1" -> 9L, "x2" -> 9L, "x3" -> 9L, "x4" -> 9L)
    val row = GoldenRecord.merge(r, a).collect()(0)
    assert(row.getString(3) == "aaa" && row.getString(4) == "aaa")
    // mode beats length: frequent short value wins mode, long one wins longest
    val r2 = recs("y1" -> "kk", "y2" -> "kk", "y3" -> "uzun sokak")
    val row2 = GoldenRecord.merge(r2, asg("y1" -> 5L, "y2" -> 5L, "y3" -> 5L)).collect()(0)
    assert(row2.getString(3) == "kk" && row2.getString(4) == "uzun sokak")
  }

  test("medoid: central member wins, singleton dist 0, equals brute force") {
    // c1: "abcd" is 1 edit from both neighbors, the outliers are 2 apart
    val r = recs("m1" -> "abcd", "m2" -> "abcx", "m3" -> "abyd", "s1" -> "lone")
    val a = asg("m1" -> 1L, "m2" -> 1L, "m3" -> 1L, "s1" -> 2L)
    val got = GoldenRecord.medoid(r, a).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "m1", 2L), (2L, "s1", 0L)))
    // tie -> min id: two equidistant members
    val r2 = recs("z2" -> "aa", "z1" -> "bb", "z3" -> "aa")
    // z1<->z2 = 2, z1<->z3 = 2, z2<->z3 = 0 => z2,z3 both sum 2; min id z2
    val row = GoldenRecord.medoid(r2, asg("z1" -> 7L, "z2" -> 7L, "z3" -> 7L)).collect()(0)
    assert((row.getLong(0), row.getString(1), row.getLong(2)) == ((7L, "z2", 2L)))
    // brute force on the fixture clusters: exact equality
    val recsF = graft.SparkEntry.addrNorm(
      graft.fixtures.AddressFixture.left(spark, sf0001))
      .unionAll(graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.rightAll(spark, sf0001)))
      .select(col("id"), col("address_norm"))
    val asgF = graft.SparkEntry.addrClusters(spark, sf0001)
    val med = GoldenRecord.medoid(recsF, asgF, textCol = "address_norm")
    // CC components over string ids are the min member id (a string)
    val rows = med.collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    // one medoid per cluster, and it is a member of its cluster
    val byComp = asgF.select(col("id"), col("component")).collect()
      .map(x => (x.getString(0), x.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(rows.length == byComp.size)
    rows.foreach { case (c, id, _) => assert(byComp(c).contains(id)) }
    // driver-side brute force over the joined records
    val recMap = recsF.collect().map(x => (x.getString(0), x.getString(1))).toMap
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val want = byComp.map { case (c, ids) =>
      val sums = ids.toSeq.map(i =>
        (i, ids.toSeq.filter(_ != i).map(j => lev(recMap(i), recMap(j)).toLong).sum))
      val best = sums.minBy(x => (x._2, x._1))
      (c, best._1, best._2)
    }.toSet
    assert(rows.toSet == want)
    // partitioning invariance
    assert(GoldenRecord.medoid(recsF.repartition(9), asgF.repartition(2),
      textCol = "address_norm").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet == rows.toSet)
  }

  test("medoid: maxMembers cap guards the quadratic (flag + min-id, null dist)") {
    // exact below the cap, capped above it — same call
    val r = recs("a1" -> "aa", "a2" -> "ab", "b1" -> "x1", "b2" -> "x2", "b3" -> "x3")
    val a = asg("a1" -> 1L, "a2" -> 1L, "b1" -> 2L, "b2" -> 2L, "b3" -> 2L)
    val got = GoldenRecord.medoid(r, a, maxMembers = 2).collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2), x.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a1", 1L, false), (2L, "b1", -1L, true)))
    // the degenerate-cluster case the guard exists for: a 10k-member
    // boilerplate cluster is 10^8 levenshtein pairs uncapped — with the
    // default cap it must complete in seconds with the flag set and the
    // deterministic min-id representative
    val big = spark.range(10000).select(
      format_string("g%05d", col("id")).as("id"),
      lit("same boilerplate text").as("text"))
    val bigAsg = big.select(col("id"), lit(42L).as("component"))
    val t0 = System.nanoTime()
    val rows = GoldenRecord.medoid(big, bigAsg).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "g00000" && rows(0).isNullAt(2) &&
      rows(0).getBoolean(3))
    assert(sec < 30.0, f"capped medoid took $sec%.1fs — guard not effective")
  }

  test("fixture: every cluster collapses to one row; canonical_id is a member") {
    val recsF = graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.left(spark, sf0001))
      .unionAll(graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.rightAll(spark, sf0001)))
      .select(col("id"), col("address_norm"))
    val clusters = graft.SparkEntry.addrClusters(spark, sf0001).cache()
    val golden = GoldenRecord.merge(recsF, clusters, textCol = "address_norm").cache()
    val nClusters = clusters.select("component").distinct().count()
    assert(golden.count() == nClusters && nClusters > 0)
    // canonical_id really is a cluster member of its component
    val bad = golden.join(clusters,
      golden("canonical_id") === clusters("id") &&
        golden("component") === clusters("component"), "left_anti").count()
    assert(bad == 0)
    // n_members sums to the number of clustered records
    val total = golden.agg(sum("n_members")).collect()(0).getLong(0)
    assert(total == clusters.count())
    golden.unpersist(); clusters.unpersist()
  }

  test("multi-field survivorship: per-field rules, null skip, all-null stays null") {
    import spark.implicits._
    // cluster 1: name mode should pick the 2-vote "ankara"; addr
    // longest should pick the long string even though it appears once;
    // b2's NULL name must not outvote; cluster 2 is all-null in name
    val r = Seq(
      ("a1", "ankara", "kizilay cd 5"),
      ("a2", "ankara", null.asInstanceOf[String]),
      ("a3", "ank", "kizilay caddesi no 5 cankaya"),
      ("b1", null.asInstanceOf[String], "x"),
      ("b2", null.asInstanceOf[String], "yy")
    ).toDF("id", "name", "addr")
    val a = asg("a1" -> 1L, "a2" -> 1L, "a3" -> 1L, "b1" -> 2L, "b2" -> 2L)
    val got = GoldenRecord.mergeFields(
      r, a, fields = Seq("name" -> "mode", "addr" -> "longest"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getString(3), x.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a1", 3L, "ankara", "kizilay caddesi no 5 cankaya"),
      (2L, "b1", 2L, null, "yy")))
  }

  test("multi-field survivorship agrees with single-column merge per rule") {
    val r = recs((1 to 30).map(i => (s"id$i", s"value ${i % 4} ${"x" * (i % 6)}")): _*)
    val a = asg((1 to 30).map(i => (s"id$i", (i % 5).toLong)): _*)
    val multi = GoldenRecord.mergeFields(
      r.withColumn("text2", col("text")), a,
      fields = Seq("text" -> "mode", "text2" -> "longest"))
    val single = GoldenRecord.merge(r, a)
    val j = multi.select(col("component"),
        col("text_mode").as("mm"), col("text2_longest").as("ml"))
      .join(single.select(col("component"), col("text_mode"), col("text_longest")),
        Seq("component"))
    assert(j.filter(col("mm") =!= col("text_mode") ||
      col("ml") =!= col("text_longest")).count() == 0)
  }

  test("incremental survivorship == full under growth, merge and a smaller-id join") {
    // records: clusters A={a1,a2}, B={b1}, C={c1} at prior; the fold
    // then (1) grows A with a3, (2) merges B into A — label stays 1 —
    // and (3) leaves C untouched; z0 joins C and STEALS its label
    // (min-id relabel), exercising the stale-prior-label drop.
    val r = recs(
      "a1" -> "ankara", "a2" -> "ankara", "a3" -> "ankr",
      "b1" -> "izmir", "c1" -> "bursa", "z0" -> "brsa")
    val priorA = asg("a1" -> 1L, "a2" -> 1L, "b1" -> 2L, "c1" -> 3L)
    val newA = asg(
      "a1" -> 1L, "a2" -> 1L, "a3" -> 1L, "b1" -> 1L,
      "c1" -> 0L, "z0" -> 0L)
    val priorGolden = GoldenRecord.merge(
      r.join(priorA.select("id"), Seq("id"), "left_semi"), priorA)
    val got = GoldenRecord.mergeIncremental(priorGolden, priorA, newA, r)
    val full = GoldenRecord.merge(r, newA)
    assert(got.collect().map(_.toString).toSet ==
      full.collect().map(_.toString).toSet)
    // medoid fold too, same topology
    val priorMed = GoldenRecord.medoid(
      r.join(priorA.select("id"), Seq("id"), "left_semi"), priorA)
    val gotM = GoldenRecord.medoidIncremental(priorMed, priorA, newA, r)
    val fullM = GoldenRecord.medoid(r, newA)
    assert(gotM.collect().map(_.toString).toSet ==
      fullM.collect().map(_.toString).toSet)
  }

  test("incremental fold handles vanished members and vanished clusters (r06)") {
    // prior: A={a1,a2} label 1, B={b1,b2} label 2. New snapshot: a2
    // VANISHED (A shrinks but label 1 persists through a1) and B
    // vanished entirely. The r05 shape silently kept both stale rows
    // (touchedComponents only scanned the new side — ADVICE r05);
    // now A is recomputed from its surviving member and B's row drops.
    val r = recs("a1" -> "ankara", "a2" -> "ankr", "b1" -> "izmir", "b2" -> "izmr")
    val priorA = asg("a1" -> 1L, "a2" -> 1L, "b1" -> 2L, "b2" -> 2L)
    val newA = asg("a1" -> 1L)
    val priorGolden = GoldenRecord.merge(r, priorA)
    val got = GoldenRecord.mergeIncremental(priorGolden, priorA, newA, r)
    val full = GoldenRecord.merge(
      r.join(newA.select("id"), Seq("id"), "left_semi"), newA)
    assert(got.collect().map(_.toString).toSet ==
      full.collect().map(_.toString).toSet)
    val priorMed = GoldenRecord.medoid(r, priorA)
    val gotM = GoldenRecord.medoidIncremental(priorMed, priorA, newA, r)
    val fullM = GoldenRecord.medoid(
      r.join(newA.select("id"), Seq("id"), "left_semi"), newA)
    assert(gotM.collect().map(_.toString).toSet ==
      fullM.collect().map(_.toString).toSet)
  }

  test("incremental survivorship == full on the fixture CC split") {
    import org.apache.spark.sql.functions.{hash => shash, pmod, not, lit}
    val recsF = graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.left(spark, sf0001))
      .unionAll(graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.rightAll(spark, sf0001)))
      .select(col("id"), col("address_norm"))
    val edges = graft.SparkEntry.addrMatchLev(spark, sf0001).localCheckpoint(true)
    val inPrior = pmod(shash(col("left_id"), col("right_id")), lit(2)) === 0
    val prior = graft.cluster.ConnectedComponents.run(
      edges.filter(inPrior), "left_id", "right_id")
    val full = graft.cluster.ConnectedComponents.runIncremental(
      prior, edges.filter(not(inPrior)), "left_id", "right_id")
    val priorGolden = GoldenRecord.merge(
      recsF, prior, idCol = "id", textCol = "address_norm")
    val got = GoldenRecord.mergeIncremental(
      priorGolden, prior, full, recsF, idCol = "id", textCol = "address_norm")
    val want = GoldenRecord.merge(
      recsF, full, idCol = "id", textCol = "address_norm")
    assert(got.collect().map(_.toString).toSet ==
      want.collect().map(_.toString).toSet)
    graft.util.CheckpointHygiene.free(prior)
    graft.util.CheckpointHygiene.free(full)
    graft.util.CheckpointHygiene.free(edges)
  }

  test("partitioning-independent") {
    val r = recs((1 to 40).map(i => (s"id$i", s"val${i % 7}")): _*)
    val a = asg((1 to 40).map(i => (s"id$i", (i % 5).toLong)): _*)
    def run(rp: Int) = GoldenRecord.merge(r.repartition(rp), a.repartition(rp + 1))
      .collect().map(_.toString).toSet
    assert(run(2) == run(11))
  }
}

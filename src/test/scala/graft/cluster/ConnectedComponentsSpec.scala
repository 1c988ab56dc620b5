package graft.cluster

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}

/** CC correctness vs a brute-force union-find oracle (SURVEY.md §7.4
  * risk 7), plus transitivity properties. */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Int, Int)], n: Int): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // fully compress
    (0 until n).map(i => i -> find(i)).toMap
  }

  /** run() frees its own intermediates; only the vertex-sized result
    * checkpoint survives it — drop that after each collect so dozens
    * of property runs don't accumulate blocks in the shared test
    * session (suites run sequentially, so a blanket unpersist is safe;
    * anything else cached just recomputes). */
  private def dropPersisted(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

  private def ccSpark(edges: Seq[(Int, Int)], checkEvery: Int = 1): Map[String, String] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
      .selectExpr("CAST(src AS STRING) AS src", "CAST(dst AS STRING) AS dst")
    try ConnectedComponents.run(df, checkEvery = checkEvery)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    finally dropPersisted()
  }

  test("property: large-star/small-star equals union-find on random graphs") {
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield (n, es)
    val prop = Prop.forAllNoShrink(gen) { case (n, es) =>
      val edges = es.filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        val uf = unionFind(edges, n)
        val got = ccSpark(edges)
        // compare only vertices present in the edge set; components are
        // min-ids in both, but string vs int ordering differs — compare
        // partition structure instead of representative values
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val gotParts = verts.groupBy(v => got(v.toString)).values.map(_.toSet).toSet
        val ufParts = verts.groupBy(uf).values.map(_.toSet).toSet
        gotParts == ufParts
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: incremental fold over a prior snapshot equals full clustering") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(2, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
      splits <- Gen.listOfN(m, Gen.oneOf(true, false))
    } yield (es, splits)
    val prop = Prop.forAllNoShrink(gen) { case (es, splits) =>
      val edges = es.filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        def df(e: Seq[(Int, Int)]) = e.toDF("src", "dst")
          .selectExpr("CAST(src AS STRING) AS src", "CAST(dst AS STRING) AS dst")
        val (e1, e2) = edges.zip(splits).partition(_._2)
        try {
          val full = ConnectedComponents.run(df(edges))
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
          val prior = ConnectedComponents.run(df(
            if (e1.isEmpty) edges.take(1) else e1.map(_._1)))
          val incr = ConnectedComponents.runIncremental(
            prior, df(if (e1.isEmpty) edges.drop(1) else e2.map(_._1)))
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
          // exact (id, component) equality, not just partition shape:
          // the star contraction must preserve min-id labels too
          incr == full
        } finally dropPersisted()
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("strict mode throws on maxIter exhaustion instead of committing wrong labels") {
    import spark.implicits._
    // a 64-node chain needs more than 1 round; default (non-strict)
    // warns and returns, strict must throw
    val chain = (0 until 63).map(i => (i, i + 1))
      .toDF("src", "dst")
      .selectExpr("CAST(src AS STRING) AS src", "CAST(dst AS STRING) AS dst")
    try {
      val e = intercept[IllegalStateException] {
        ConnectedComponents.run(chain, maxIter = 1, strict = true)
      }
      assert(e.getMessage.contains("maxIter"))
    } finally dropPersisted()
  }

  test("deterministic: long chain + star + isolated self-loop") {
    import spark.implicits._
    // chain 0-1-2-...-9 (diameter stress), star 20<-21..25, self-loop 30
    val edges = (0 until 9).map(i => (s"v${i}", s"v${i + 1}")) ++
      (21 to 25).map(i => (s"v20", s"v$i")) :+ (("v30", "v30"))
    val out = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert((0 to 9).forall(i => out(s"v$i") == "v0"))
    assert((21 to 25).forall(i => out(s"v$i") == "v20") && out("v20") == "v20")
    assert(out("v30") == "v30") // self-loop-only vertex keeps own id
  }

  test("checkEvery > 1: chained rounds converge to the same partition") {
    import spark.implicits._
    // diameter-10 chain needs several rounds; cadence 2 exercises
    // mid-chain fixed points, cadence 5 a chain longer than the whole
    // convergence (pure no-op tail)
    val edges = (0 until 9).map(i => (s"v${i}", s"v${i + 1}")) ++
      (21 to 25).map(i => (s"v20", s"v$i")) :+ (("v30", "v30"))
    def run(k: Int): Map[String, String] = {
      val out = ConnectedComponents.run(edges.toDF("src", "dst"), checkEvery = k)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      dropPersisted(); out
    }
    val base = run(1)
    for (k <- Seq(2, 5)) assert(run(k) == base, s"checkEvery=$k diverged")
  }

  test("property: checkEvery=3 equals union-find on random graphs") {
    val gen = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 45)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield (n, es)
    val prop = Prop.forAllNoShrink(gen) { case (n, es) =>
      val edges = es.filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        val uf = unionFind(edges, n)
        val got = ccSpark(edges, checkEvery = 3)
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val gotParts = verts.groupBy(v => got(v.toString)).values.map(_.toSet).toSet
        val ufParts = verts.groupBy(uf).values.map(_.toSet).toSet
        gotParts == ufParts
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("run() releases everything but the vertex-sized result checkpoint") {
    import spark.implicits._
    dropPersisted() // start clean in the shared session
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val edges = (0 until 9).map(i => (s"v${i}", s"v${i + 1}")).toDF("src", "dst")
    val out = ConnectedComponents.run(edges)
    assert(out.count() == 10)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    val resultIds = graft.util.CheckpointHygiene.backingRdds(out).map(_.id).toSet
    assert(resultIds.nonEmpty, "result must be checkpoint-backed")
    assert(leaked == resultIds,
      s"run() left extra persisted RDDs: ${leaked -- resultIds}")
    dropPersisted()
  }

  test("reliable checkpoint: same result, and a re-run resumes from snapshots") {
    import spark.implicits._
    val edges = ((0 until 9).map(i => (s"v${i}", s"v${i + 1}")) ++
      (21 to 25).map(i => (s"v20", s"v$i"))).toDF("src", "dst")
    val plain = ConnectedComponents.run(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val cp = Some(ConnectedComponents.CcCheckpoint(dir, "cc", everyRounds = 1))
    val ck = ConnectedComponents.run(edges, checkpoint = cp)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ck == plain, "checkpointed run diverged from localCheckpoint run")
    // snapshots were committed per round/step
    val tables = new java.io.File(dir).list().toSeq
    assert(tables.nonEmpty && tables.forall(_.startsWith("cc_")))
    val snapshotCount = tables.map(t =>
      graft.io.TableIO.latestSnapshotId(dir, t).map(_ + 1).getOrElse(0L)).sum
    // resume: an identical re-run must read every round back instead of
    // committing new snapshots (lineage hashes match)
    val ck2 = ConnectedComponents.run(edges, checkpoint = cp)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ck2 == plain)
    val snapshotCount2 = new java.io.File(dir).list().toSeq.map(t =>
      graft.io.TableIO.latestSnapshotId(dir, t).map(_ + 1).getOrElse(0L)).sum
    assert(snapshotCount2 == snapshotCount,
      s"re-run committed new snapshots: $snapshotCount -> $snapshotCount2")
  }
}

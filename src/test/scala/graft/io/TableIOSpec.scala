package graft.io

import graft.SparkSpec
import graft.pipeline.Pipeline
import java.nio.file.{Files, Paths}

class TableIOSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_tableio").toString

  test("commit -> read round trip with manifest metrics") {
    import spark.implicits._
    val root = tmpRoot()
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4)
    val c = TableIO.commitSnapshot(df, root, "t1", Map("input" -> "x"))
    assert(c.snapshotId == 0L && c.rows == 100)
    val back = TableIO.readTable(spark, root, "t1")
    assert(back.count() == 100)
    val manifest = Files.readString(Paths.get(c.path, "manifest.json"))
    assert(manifest.contains("\"rows\": 100"))
    assert(manifest.contains("\"partitions\":"))
    assert(manifest.contains("lineage_hash"))
  }

  test("commit metrics come from footers: O(1) Spark jobs for an N-file snapshot") {
    import spark.implicits._
    val root = tmpRoot()
    val df = (1 to 800).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(8)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val c = TableIO.commitSnapshot(df, root, "tjobs", Map("input" -> "x"))
      // listener events are async; wait for the count to go quiet
      var last = -1
      var spins = 0
      while (jobs.get() != last && spins < 20) {
        last = jobs.get(); spins += 1; Thread.sleep(100)
      }
      assert(c.rows == 800)
      // the parquet write is 1 job (+1 for a possible AQE/commit extra);
      // the old per-file-count loop would have added 8 more
      assert(jobs.get() <= 2, s"commit ran ${jobs.get()} jobs for an 8-file snapshot")
      val manifest = Files.readString(Paths.get(c.path, "manifest.json"))
      assert(manifest.contains("\"rows\": 800"))
      // per-file rows still recorded, now footer-sourced
      assert("\"rows\": 100".r.findAllIn(manifest).size == 8)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("expireSnapshots keeps the newest K; latest stays readable; keepLast floors at 1") {
    import spark.implicits._
    val root = tmpRoot()
    for (i <- 1 to 5)
      TableIO.commitSnapshot(
        (1 to i).map(j => (j.toLong, s"v$j")).toDF("id", "v"),
        root, "t", Map("batch" -> i.toString))
    val expired = TableIO.expireSnapshots(root, "t", keepLast = 2)
    assert(expired == Seq(0L, 1L, 2L))
    val left = Files.list(Paths.get(root, "t")).iterator()
    val names = Iterator.continually(left).takeWhile(_.hasNext).map(_.next()
      .getFileName.toString).filter(_.startsWith("snapshot=")).toSet
    assert(names == Set("snapshot=3", "snapshot=4"))
    assert(TableIO.latestSnapshotId(root, "t").contains(4L))
    assert(TableIO.readTable(spark, root, "t").count() == 5)
    // keepLast < 1 coerces to 1: the latest snapshot is never expired
    assert(TableIO.expireSnapshots(root, "t", keepLast = 0) == Seq(3L))
    assert(TableIO.readTable(spark, root, "t").count() == 5)
    // and the next commit continues the id sequence from the survivor
    val c = TableIO.commitSnapshot(
      Seq((1L, "x")).toDF("id", "v"), root, "t", Map("batch" -> "6"))
    assert(c.snapshotId == 5L)
    // orphaned _tmp_ staging dirs (crashed commit): swept when stale
    // (>1h by mtime, recursively), protected when fresh
    val stale = Files.createDirectory(Paths.get(root, "t", "_tmp_deadbeef"))
    Files.writeString(stale.resolve("part-0.parquet"), "x")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L)
    Files.setLastModifiedTime(stale.resolve("part-0.parquet"), old)
    Files.setLastModifiedTime(stale, old)
    val fresh = Files.createDirectory(Paths.get(root, "t", "_tmp_cafebabe"))
    Files.writeString(fresh.resolve("part-0.parquet"), "y")
    TableIO.expireSnapshots(root, "t", keepLast = 2)
    assert(!Files.exists(stale), "stale _tmp_ dir not swept")
    assert(Files.exists(fresh), "fresh (in-flight) _tmp_ dir must survive")
  }

  test("resumeOrCompute: same lineage resumes, changed lineage recomputes") {
    import spark.implicits._
    val root = tmpRoot()
    var computes = 0
    def job = { computes += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val (_, resumed1) = TableIO.resumeOrCompute(spark, root, "t", Map("k" -> "1"))(job)
    val (_, resumed2) = TableIO.resumeOrCompute(spark, root, "t", Map("k" -> "1"))(job)
    val (_, resumed3) = TableIO.resumeOrCompute(spark, root, "t", Map("k" -> "2"))(job)
    assert(!resumed1 && resumed2 && !resumed3)
    assert(computes == 2)
    assert(TableIO.latestSnapshotId(root, "t").contains(1L))
  }

  test("pipeline: full run commits 4 stages; second run resumes all") {
    val root = tmpRoot()
    // default config doesn't salt, so no hot_keys statistic stage
    // (PipelineSpec covers the salted 5-stage shape)
    val first = Pipeline.run(spark, sf0001, root)
    assert(first.stages.map(_.table) == Seq("conv_norm", "matches", "clusters", "golden"))
    assert(first.stages.forall(!_.resumed))
    assert(first.stages.forall(_.rows > 0))
    val second = Pipeline.run(spark, sf0001, root)
    assert(second.stages.forall(_.resumed), s"expected full resume: ${second.stages}")
    // and results identical across the resume boundary
    assert(first.stages.map(_.rows) == second.stages.map(_.rows))
  }
}

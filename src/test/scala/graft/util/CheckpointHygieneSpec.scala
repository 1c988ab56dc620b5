package graft.util

import graft.SparkSpec

class CheckpointHygieneSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("backingRdds finds the checkpoint RDD; plain frames yield none") {
    import spark.implicits._
    val base = Seq(1, 2, 3).toDF("x")
    assert(CheckpointHygiene.backingRdds(base).isEmpty)
    val lazyCk = base.localCheckpoint(false)
    assert(CheckpointHygiene.backingRdds(lazyCk).nonEmpty, "lazy checkpoint")
    val eagerCk = base.localCheckpoint(true)
    assert(CheckpointHygiene.backingRdds(eagerCk).nonEmpty, "eager checkpoint")
    CheckpointHygiene.free(lazyCk)
    CheckpointHygiene.free(eagerCk)
  }

  test("free() releases exactly the frame's blocks") {
    import spark.implicits._
    val ck = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val id = CheckpointHygiene.backingRdds(ck).head.id
    assert(persistedIds.contains(id))
    CheckpointHygiene.free(ck)
    assert(!persistedIds.contains(id), "checkpoint RDD still registered after free")
  }

  test("advance() frees the previous round but never a bystander RDD") {
    import spark.implicits._
    val hygiene = new CheckpointHygiene
    val r1 = hygiene.add(Seq(1).toDF("x").localCheckpoint(true))
    hygiene.advance()
    // an unrelated checkpoint registered between rounds — e.g. a
    // concurrent job on the same session — must survive the rotation
    val bystander = Seq(9).toDF("x").localCheckpoint(true)
    val bid = CheckpointHygiene.backingRdds(bystander).head.id
    val r1id = CheckpointHygiene.backingRdds(r1).head.id
    val r2 = hygiene.add(Seq(2).toDF("x").localCheckpoint(true))
    hygiene.advance()
    assert(!persistedIds.contains(r1id), "previous round not freed")
    assert(persistedIds.contains(bid), "bystander RDD was force-unpersisted")
    assert(CheckpointHygiene.backingRdds(r2).forall(r => persistedIds.contains(r.id)),
      "current round must stay persisted")
    hygiene.releaseAll()
    CheckpointHygiene.free(bystander)
    assert(!persistedIds.contains(bid))
  }
}

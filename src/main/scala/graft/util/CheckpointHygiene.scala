package graft.util

import org.apache.spark.SparkContext

/** Bookkeeping for iterative jobs that localCheckpoint a frame per
  * round: the Dataset API exposes no handle on the RDD a checkpoint
  * registers, so superseded rounds are freed by diffing the context's
  * persistent-RDD registry around each checkpoint's creation
  * (registration happens at creation time even for lazy checkpoints;
  * materialization stays lazy). Without this a k-round loop pins k
  * copies of its working set in executor storage. */
final class CheckpointHygiene(sc: SparkContext) {
  private var current: Set[Int] = Set.empty

  private def ids: Set[Int] = sc.getPersistentRDDs.keySet.toSet

  /** Run `create` (which must register exactly the new round's
    * checkpoint), record its RDD ids as the current round, and free the
    * previous round's. Call only once the new checkpoint is — or is
    * about to be — materialized past the old one (eager checkpoints:
    * immediately; lazy: after the action that materializes it). */
  def rotate[A](create: => A): A = {
    val before = ids
    val out = create
    val created = ids -- before
    free()
    current = created
    out
  }

  /** Like rotate, but defer freeing the previous round until [[freePrev]]
    * — for LAZY checkpoints whose materializing action runs after
    * creation. */
  def track[A](create: => A): A = {
    val before = ids
    val out = create
    pending = ids -- before
    out
  }
  private var pending: Set[Int] = Set.empty

  /** Free the superseded round recorded before the last [[track]] and
    * promote the tracked ids to current. */
  def freePrev(): Unit = { free(); current = pending; pending = Set.empty }

  private def free(): Unit = {
    val reg = sc.getPersistentRDDs
    current.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
  }
}

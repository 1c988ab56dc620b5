package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bookkeeping for iterative jobs that localCheckpoint a frame per
  * round: a localCheckpoint pins its blocks until session end and the
  * Dataset API offers no release handle, so without this a k-round
  * loop pins k copies of its working set in executor storage.
  *
  * The backing RDD is reachable through the checkpointed frame's
  * [[LogicalRDD]] leaf, so rounds are freed PRECISELY — attributing by
  * diffing the context's global persistent-RDD registry would capture
  * (and later force-unpersist) RDDs registered concurrently by other
  * jobs on the same session, whose localCheckpoint blocks are
  * unrecoverable once dropped. */
object CheckpointHygiene {

  /** The RDDs backing a (local)checkpointed frame: the [[LogicalRDD]]
    * leaves of its logical plan. One element for a checkpoint output;
    * empty for frames that are not checkpoint-backed (e.g. a
    * parquet-backed snapshot restore) — making [[free]] a safe no-op
    * on them. */
  def backingRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd }

  /** Release a checkpointed frame's blocks. Only call once nothing
    * will read the frame again — local checkpoints cannot be
    * recomputed. */
  def free(df: DataFrame): Unit =
    backingRdds(df).foreach(_.unpersist(blocking = false))
}

/** Tracks the checkpoints of one iterative loop in two generations:
  * [[add]] registers frames checkpointed for the round being built;
  * [[advance]] — called once the new round is materialized and its
  * lineage truncated past the old one — frees the previous round. */
final class CheckpointHygiene {
  import CheckpointHygiene._

  private var current: List[RDD[_]] = Nil
  private var next: List[RDD[_]] = Nil

  /** Register a frame checkpointed for the round being built and
    * return it. */
  def add(df: DataFrame): DataFrame = {
    next = backingRdds(df).toList ::: next
    df
  }

  /** The new round is materialized: free the previous round's blocks
    * and promote the registrations since the last advance. */
  def advance(): Unit = {
    current.foreach(_.unpersist(blocking = false))
    current = next
    next = Nil
  }

  /** Free everything still tracked — the last promoted round and any
    * unadvanced registrations. Do NOT call while a tracked frame can
    * still be read (e.g. when the loop's final round is the returned
    * result). */
  def releaseAll(): Unit = {
    (current ::: next).foreach(_.unpersist(blocking = false))
    current = Nil
    next = Nil
  }
}

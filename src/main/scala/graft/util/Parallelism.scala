package graft.util

import org.apache.spark.sql.SparkSession

/** Partition-count policy for the engine's EXPLICIT repartitions
  * (guide §2.5 input spreading, §2.2 "fewer, larger partitions").
  *
  * Why not `spark.sql.shuffle.partitions` everywhere: that conf is an
  * admin-sized constant for BYTE-heavy reduce stages. The engine's
  * explicit repartitions are mostly the opposite shape — a small scan
  * fanned out ahead of a compute-heavy narrow chain (address/variant
  * synthesis, the normalize regex chains, k-shingling), where the
  * right task count tracks the CORES the session can actually run.
  * Measured at sf0.1/local[32] (OPTIMIZATION_r06.md): 256-partition
  * spreads make ~150-row tasks whose scheduling cost exceeds their
  * compute several-fold across every stage of the chain.
  *
  * Both knobs are scale-adaptive, never constants:
  *   - [[spread]] = 2 × `defaultParallelism` (total session cores; on
  *     a cluster that is executors × cores, so the count grows with
  *     the hardware — 2× leaves straggler/imbalance headroom). Used
  *     where the spread exists purely to parallelize per-row compute.
  *   - [[explodingJoin]] = max(shuffle.partitions, 2 × cores). The
  *     block join's output is orders of magnitude larger than its
  *     input, so its partition count must never drop below what the
  *     admin sized for reduce stages (skew/memory headroom at real
  *     scale), but must also not starve a session whose core count
  *     exceeds the conf.
  *
  * `GRAFT_SPREAD_PARTS` / `GRAFT_JOIN_PARTS` override for diagnostics
  * (BenchExtra A/B runs) only — production paths read the defaults.
  */
object Parallelism {

  /** Partitions for compute-bound input spreading. */
  def spread(spark: SparkSession): Int =
    sys.env.get("GRAFT_SPREAD_PARTS").map(_.toInt)
      .getOrElse(math.max(2 * spark.sparkContext.defaultParallelism, 1))

  /** Partitions for exploding (block/band) join exchanges. */
  def explodingJoin(spark: SparkSession): Int =
    sys.env.get("GRAFT_JOIN_PARTS").map(_.toInt)
      .getOrElse(math.max(spark.sessionState.conf.numShufflePartitions,
        2 * spark.sparkContext.defaultParallelism))
}

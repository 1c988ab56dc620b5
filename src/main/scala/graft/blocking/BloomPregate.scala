package graft.blocking

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pregate — the "runtime row-level filtering" scale
  * lever, made explicit for the block join.
  *
  * A block match joins a (comparatively small) probe batch against a
  * huge committed corpus on `block_key`. The join itself is exact, but
  * it is a SHUFFLE: every corpus row is hashed and written to shuffle
  * storage, including the (at 100 TB, vast) majority whose block key
  * never occurs in the batch — those rows travel the wire only to be
  * dropped by the join. This pregate builds a Bloom filter over the
  * batch side's keys (one map-side-combined aggregate pass, a few MB
  * sketch) and applies `might_contain` at the corpus scan, BEFORE the
  * exchange, so non-candidate rows never enter the shuffle at all.
  *
  * Exactness: the filter admits every true key (same `xxhash64` on
  * both sides — no false negatives) and its false positives are
  * eliminated by the exact equi-join that follows, so the match output
  * is bit-identical with the pregate on or off (oracle-checked:
  * `m_match_bloom` hashes against the same DuckDB SQL as the plain
  * path; equivalence also property-tested in MatcherSpec).
  *
  * Plan shape (asserted in PlanSpec): the sketch is built by a
  * [[BloomFilterAggregate]] with a partial (map-side) merge — the
  * shuffle between the two aggregate halves carries one sketch per
  * partition, never the keys — and reaches the corpus-side filter as a
  * scalar SUBQUERY (the same mechanism Spark's adaptive runtime
  * filtering injects), not a driver collect: no key set, no giant
  * `isin`, nothing driver-side but the plan itself.
  *
  * This is exactly what `spark.sql.optimizer.runtime.bloomFilter
  * .enabled` would inject for a selective build-side filter; it is
  * explicit here because the optimizer's injection heuristics
  * (creation-side selectivity + size thresholds) don't recognize a
  * "small batch vs huge corpus" match where the batch side has no
  * selective predicate — the caller knows the asymmetry and states it.
  */
object BloomPregate {

  /** Spark's own runtime-filter ceiling (8 MB of bits) — past this the
    * broadcast of the sketch costs more than the shuffle it saves. */
  private val MaxNumBits: Long = 67108864L

  /** Predicate for `target.filter(...)`: true iff `xxhash64(targetKey)`
    * might be present among `xxhash64(sourceKey)` over `source`.
    *
    * No false negatives (identical keys hash identically), so as a
    * pregate on the probe side of an exact equi-join it never changes
    * the join result. False positives (bloom FP + 64-bit hash
    * collisions) pass through and are dropped by the join.
    *
    * `expectedItems` sizes the sketch (distinct source keys, an
    * estimate — e.g. the row count of the block-key histogram a
    * snapshot commit records); `fpp` trades sketch bytes against the
    * fraction of non-candidate corpus rows that still shuffle.
    *
    * Null `targetKey` rows KEEP their (deterministic) hash and are
    * filtered like any other value — for inner equi-joins, which never
    * match null keys, either outcome is semantics-preserving. */
  def keyFilter(
      source: DataFrame,
      sourceKey: Column,
      targetKey: Column,
      expectedItems: Long,
      fpp: Double = 0.03): Column = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = math.min(
      math.max(BloomFilter.optimalNumOfBits(expectedItems, fpp), 64L), MaxNumBits)
    val agg = new BloomFilterAggregate(
      GraftShim.expression(xxhash64(sourceKey)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val sketchPlan = source.select(GraftShim.column(agg).as("__bloom"))
      .queryExecution.analyzed
    GraftShim.column(BloomFilterMightContain(
      ScalarSubquery(sketchPlan), GraftShim.expression(xxhash64(targetKey))))
  }
}

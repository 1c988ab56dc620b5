package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (J29) — the
  * EXACT counterpart to the MinHash-LSH candidate generator: returns
  * precisely the cross-side pairs whose token-set Jaccard is at or
  * above the threshold, with a correctness proof instead of a recall
  * probability. Prefix-filtering principle (Chaudhuri, Ganti & Kaushik,
  * "A Primitive Operator for Similarity Joins in Data Cleaning", ICDE
  * 2006; Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity
  * Search", WWW 2007; Xiao et al.'s PPJoin family refines the same
  * bound): order all tokens by one global total order, keep only each
  * record's first `|x| − ⌈t·|x|⌉ + 1` tokens as its PREFIX, and join
  * prefixes on token equality. Any pair with J ≥ t must share a prefix
  * token — if A's prefix misses B's prefix entirely, the overlap is
  * confined to A's last `⌈t·|A|⌉ − 1` tokens, below the `⌈t·|A|⌉`
  * overlap J ≥ t forces — so the candidate set has NO false negatives,
  * and the exact verification pass makes the join exact end to end.
  *
  * Scale shape (why this survives 100 TB): the global order is
  * document-frequency ascending, so prefixes hold each record's RAREST
  * tokens — the candidate join's keys are inherently low-frequency and
  * the hot tokens ("mahalle", bare digits) that melt a naive token join
  * never become join keys. One df aggregation (map-side combined), one
  * id-partitioned window to rank tokens within each record, one
  * rare-key equi-join, then per-candidate verification against
  * pre-collected sorted token arrays — no all-pairs stage anywhere, no
  * iteration. Versus [[MetaBlocking]]: that purges hot blocks and keeps
  * a weighted graph (approximate, tunable); this keeps a provably
  * complete candidate set for a hard threshold. Versus MinHash-LSH:
  * no banding recall curve to reason about, at the cost of exact
  * verification on every candidate.
  */
object SetSimJoin {

  /** The PPJoin-family per-side prefix factor `f`: similarity ≥ t
    * forces overlap ≥ ⌈f·len⌉ on EACH side, so the prefix keeping the
    * first `len − ⌈f·len⌉ + 1` rarest tokens cannot miss a qualifying
    * pair. Derivations (inter ≤ min(la, lb) throughout):
    * Jaccard  J = i/(la+lb−i) ≥ t ⇒ i ≥ t·union ≥ t·la            → f = t;
    * cosine   C = i/√(la·lb) ≥ t ⇒ lb ≥ t²·la and i ≥ t²·la       → f = t²;
    * Dice     D = 2i/(la+lb) ≥ t ⇒ i(2−t) ≥ t·la ⇒ i ≥ t·la/(2−t) → f = t/(2−t).
    * The same f bounds partner lengths: f·la ≤ lb ≤ la/f (prune-only).
    */
  /** The family's per-row verify token set (r06): sorted distinct
    * tokens under the membership tokenizer (split on ' ', drop
    * empties), computed by the fused
    * [[graft.similarity.SortedTokenSet]] expression with NO shuffle —
    * element-identical to `sort_array(collect_list(tok))` over the
    * exploded membership for the family's one-record-per-id inputs
    * (the DuckDB mirrors group by id under the same assumption). Each
    * verify stage that previously re-aggregated membership saves one
    * exchange + one ObjectHashAggregate per side (guide §2.4).
    *
    * PRECONDITION (now as before, but worth naming since the guard is
    * structural, not asserted): `idCol` identifies ONE record — the
    * whole family (candidates' la/lb, the oracle mirrors' per-id
    * grouping) is already undefined under duplicate ids, and with
    * per-row sets a duplicate id would additionally fan out the
    * verify join. */
  private def rowTokenSet(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.similarity.SortedTokenSet(
      org.apache.spark.sql.GraftShim.expression(c), spaceOnly = true))

  private def prefixFactor(sim: String, t: Double): Double = sim match {
    case "jaccard" => t
    case "cosine"  => t * t
    case "dice"    => t / (2.0 - t)
    case other     => throw new IllegalArgumentException(s"unknown sim: $other")
  }

  /** Exact Jaccard-threshold join — see [[simJoin]]. */
  def jaccardJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text"): DataFrame =
    simJoin(left, right, threshold, "jaccard", idCol, textCol)

  /** Exact set-similarity threshold join: every (`left` id, `right`
    * id) pair whose distinct-whitespace-token similarity is ≥
    * `threshold`, with the score. `sim` picks the function — "jaccard",
    * "cosine" (|∩|/√(|A||B|)) or "dice" (2|∩|/(|A|+|B|)) — each with
    * its own provably-complete prefix bound ([[prefixFactor]]).
    * Records with no tokens never match (similarity undefined →
    * dropped, consistent with their empty membership).
    *
    * @return (left_id, right_id, score)
    */
  def simJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      sim: String = "jaccard",
      idCol: String = "id",
      textCol: String = "text",
      positional: Boolean = true): DataFrame = {
    val cand = candidates(left, right, threshold, sim, idCol, textCol, positional)
    // Verification: exact similarity against per-row token sets
    // ([[rowTokenSet]], r06 — no membership re-aggregation), so the
    // per-candidate cost is two id-keyed joins and the corpus is never
    // re-shuffled.
    val inter = size(array_intersect(col("l_ts"), col("r_ts"))).cast("double")
    val score = sim match {
      case "jaccard" => inter / (col("la") + col("lb") - inter).cast("double")
      case "cosine"  => inter / sqrt(col("la").cast("double") * col("lb").cast("double"))
      case _         => lit(2.0) * inter / (col("la") + col("lb")).cast("double")
    }
    cand
      .join(left.select(col(idCol).as("left_id"), rowTokenSet(col(textCol)).as("l_ts")),
        Seq("left_id"))
      .join(right.select(col(idCol).as("right_id"), rowTokenSet(col(textCol)).as("r_ts")),
        Seq("right_id"))
      .select(col("left_id"), col("right_id"), score.as("score"))
      .filter(col("score") >= lit(threshold))
  }

  /** Bound arithmetic epsilon: every pruning bound compares an integer
    * against a double product, and an upward double rounding on an
    * exact-integer boundary (e.g. f·len landing on ⌈·⌉'s edge) would
    * over-prune — a FALSE NEGATIVE, not a performance loss. All bounds
    * therefore give the double side 1e-9 slack: relative double error
    * here is ~1e-16·len, so the slack can only ever keep a candidate,
    * never drop one. */
  private val Eps = 1e-9

  /** The candidate-pair stage of [[simJoin]] — exposed package-private
    * so specs can measure pruning. Output: (left_id, right_id, la, lb),
    * a superset of all qualifying pairs (never a false negative).
    *
    * `positional` adds the PPJoin positional filter (Xiao, Wang, Lin &
    * Yu, "Efficient Similarity Joins for Near Duplicate Detection",
    * WWW 2008): for a candidate pair let w₀ be its first shared prefix
    * token in the global order. No common token precedes w₀ (such a
    * token would itself be a shared prefix token — both positions are
    * smaller), so overlap ≤ min(la − pa₀, lb − pb₀) + 1; prune when
    * that upper bound is below the pair's required overlap
    * (jaccard: t(la+lb)/(1+t); cosine: t√(la·lb); dice: t(la+lb)/2).
    * Because both sides rank tokens by the SAME total order, the
    * min-position token per side is the same w₀ — so `min(pa)` /
    * `min(pb)` within the pair group both locate it, and the dedup
    * `distinct()` becomes a same-shuffle groupBy. Pruning-only: the
    * verified output is identical with the flag on or off.
    */
  private[blocking] def candidates(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      sim: String,
      idCol: String,
      textCol: String,
      positional: Boolean): DataFrame = {
    val f = prefixFactor(sim, threshold)
    val lm = MetaBlocking.membership(left, idCol, textCol)
    val rm = MetaBlocking.membership(right, idCol, textCol)
    // One global total order: document frequency ascending across BOTH
    // sides, token ASC tie-break. Any total order is correct; rare-first
    // minimizes candidates AND keys the join on cold tokens.
    val dfq = lm.select("tok").unionAll(rm.select("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    def prefix(m: DataFrame): DataFrame = {
      val byRank = Window.partitionBy("id").orderBy(col("cnt").asc, col("tok").asc)
      m.join(dfq, Seq("tok"))
        .withColumn("pos", row_number().over(byRank))
        .withColumn("len", count(lit(1)).over(Window.partitionBy("id")))
        // p = len − ⌈f·len⌉ + 1 (per-side overlap bound α = ⌈f·len⌉);
        // integer-vs-double form with Eps slack (see Eps)
        .filter(col("pos").cast("double") <=
          col("len").cast("double") - (lit(f) * col("len") - lit(Eps)) + 1.0)
        .select("id", "tok", "pos", "len")
    }
    val joined = prefix(lm)
      .select(col("id").as("left_id"), col("tok"),
        col("pos").as("pa"), col("len").as("la"))
      .join(prefix(rm)
        .select(col("id").as("right_id"), col("tok"),
          col("pos").as("pb"), col("len").as("lb")), Seq("tok"))
      // length filter — prune-only (verification is exact either way)
      .filter(col("lb").cast("double") >= lit(f) * col("la") - lit(Eps) &&
        col("lb").cast("double") <= col("la").cast("double") / lit(f) + lit(Eps))
    if (!positional)
      joined.select("left_id", "right_id", "la", "lb").distinct()
    else {
      val alpha = sim match {
        case "jaccard" =>
          lit(threshold) / (lit(1.0) + lit(threshold)) * (col("la") + col("lb")).cast("double")
        case "cosine" =>
          lit(threshold) * sqrt(col("la").cast("double") * col("lb").cast("double"))
        case _ =>
          lit(threshold) * (col("la") + col("lb")).cast("double") / lit(2.0)
      }
      joined.groupBy(col("left_id"), col("right_id"), col("la"), col("lb"))
        .agg(min(col("pa")).as("pa0"), min(col("pb")).as("pb0"))
        .filter(
          (least(col("la") - col("pa0"), col("lb") - col("pb0")) + 1).cast("double")
            >= alpha - lit(Eps))
        .select("left_id", "right_id", "la", "lb")
    }
  }

  /** Exact WEIGHTED-cosine threshold join (J31) — the AllPairs upgrade
    * of [[simJoin]]'s unweighted cosine (Bayardo, Ma & Srikant, WWW
    * 2007 §3: prefix filtering over weighted vectors): every cross-side
    * pair whose inverse-document-frequency-weighted token cosine is ≥
    * `threshold`. Rare tokens dominate the score, so two transcripts
    * sharing "xk17_tool_trace" match even when one padded itself with
    * ubiquitous filler tokens that would sink the unweighted Jaccard.
    *
    * Weighting: `w(tok) = max(1, scale div df(tok))` — the harmonic
    * (1/df) idf family on an exact-integer grid. Deliberately NOT
    * log-idf: every weight, norm and dot product stays a BIGINT (w ≤
    * scale=10⁶ ⇒ w² ≤ 10¹², record sums ≪ 2⁶³), so scores are single
    * final-double divisions of exact integers — bit-identical across
    * engines and partitionings, which is what makes the operator
    * DuckDB-hashable. A log-idf drop-in would differ only in the `ww`
    * weight table (and give up cross-engine bit-exactness to libm).
    *
    * Prefix bound (norm-based, not count-based): order each record's
    * tokens by ONE global total order (weight DESC = rarest first, tok
    * ASC ties) and keep position `pos` iff the tail ℓ₂² from `pos` on,
    * `revcum(pos) = Σ_{i≥pos} w_i²`, is ≥ t²·‖x‖². Completeness: let w₀
    * be a qualifying pair's first shared token in the global order. If
    * w₀ is outside a's prefix, ALL shared tokens sit in a's tail, so by
    * Cauchy-Schwarz dot ≤ √revcum_a(pos_a(w₀))·‖b‖ < t·‖a‖·‖b‖ —
    * contradiction; symmetrically for b. So w₀ lands in BOTH prefixes
    * and the prefix-prefix equi-join has no false negatives. The bound
    * is epsilon-guarded ([[Eps]]) like every integer-vs-double compare
    * here. Scale shape: prefixes hold the HIGHEST-weight = rarest
    * tokens, so join keys are cold by construction (the same property
    * df-ascending gives [[simJoin]]); verification joins candidates
    * back to the weighted membership — per-candidate cost, no all-pairs
    * stage, two map-side-combined aggregations.
    *
    * @return (left_id, right_id, score) with score = dot/√(‖a‖²‖b‖²)
    */
  def weightedCosineJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text",
      weightScale: Long = 1000000L): DataFrame = {
    val lm = MetaBlocking.membership(left, idCol, textCol)
    val rm = MetaBlocking.membership(right, idCol, textCol)
    val ww = lm.select("tok").unionAll(rm.select("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"),
        greatest(lit(1L), expr(s"CAST($weightScale AS BIGINT) div cnt")).as("w"))
    val wl = lm.join(ww, Seq("tok"))
    val wr = rm.join(ww, Seq("tok"))
    val t2 = threshold * threshold // one Scala double, inlined in the mirror too
    def prefix(m: DataFrame): DataFrame = {
      val byRank = Window.partitionBy("id").orderBy(col("w").desc, col("tok").asc)
      m.withColumn("revcum", sum(col("w") * col("w")).over(
          byRank.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("nsq", sum(col("w") * col("w")).over(Window.partitionBy("id")))
        // RELATIVE epsilon (Eps·nsq): squared norms reach ~scale²·|tokens|
        // ≈ 1e13-1e15, where t²·nsq's double rounding is ~1e-1 — an
        // absolute 1e-9 could over-prune an exact-boundary pair (see the
        // weightedJaccardJoin prefix for the full argument)
        .filter(col("revcum").cast("double") >=
          lit(t2) * col("nsq").cast("double") - lit(Eps) * col("nsq").cast("double"))
        .select("id", "tok")
    }
    val cand = prefix(wl).select(col("id").as("left_id"), col("tok"))
      .join(prefix(wr).select(col("id").as("right_id"), col("tok")), Seq("tok"))
      .select("left_id", "right_id").distinct()
    def norms(m: DataFrame, out: String) =
      m.groupBy(col("id").as(out))
        .agg(sum(col("w") * col("w")).cast("long").as(out + "_nsq"))
    cand
      .join(wl.select(col("id").as("left_id"), col("tok"), col("w").as("wl")),
        Seq("left_id"))
      .join(wr.select(col("id").as("right_id"), col("tok"), col("w").as("wr")),
        Seq("right_id", "tok"))
      .groupBy("left_id", "right_id")
      .agg(sum(col("wl") * col("wr")).cast("long").as("dot"))
      .join(norms(wl, "left_id"), Seq("left_id"))
      .join(norms(wr, "right_id"), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (col("dot").cast("double") / sqrt(
          col("left_id_nsq").cast("double") * col("right_id_nsq").cast("double")))
          .as("score"))
      .filter(col("score") >= lit(threshold))
  }

  /** Exact WEIGHTED-Jaccard threshold join (J34): every cross-side
    * pair with `W(A∩B) / W(A∪B) ≥ t`, where each token carries the
    * same integer idf weight as [[weightedCosineJoin]] (`max(1, scale
    * div df)`) and a set's weight is the sum over its tokens. The
    * weighted upgrade of [[simJoin]]'s Jaccard: sharing one rare
    * identifier outweighs sharing a pile of ubiquitous filler, while
    * the UNION in the denominator still punishes unshared bulk (the
    * property [[containJoin]] deliberately gives up).
    *
    * Prefix bound (weight-mass form): J ≥ t forces shared weight
    * `W(A∩B) ≥ t·W(A∪B) ≥ t·W(A)`. Order each record's tokens by the
    * global weight-DESC (tok ASC) order and keep position p while the
    * tail mass `revcum(p) = Σ_{i≥p} w_i ≥ t·W(x)`. If a qualifying
    * pair's first shared token w₀ sits outside A's prefix, every
    * shared token sits in A's tail below the cut, so W(A∩B) ≤
    * revcum < t·W(A) — contradiction; symmetrically for B, so the
    * prefix-prefix equi-join is complete. Weight-mass length filter
    * (prune-only, classic Jaccard bound on masses): t·W(A) ≤ W(B) ≤
    * W(A)/t. Every mass is a BIGINT; the score is one final double
    * division of exact integers — bit-identical across engines and
    * partitionings (DuckDB-hashable), same discipline as J31.
    *
    * @return (left_id, right_id, score) with
    *         score = shared/(wa + wb − shared)
    */
  def weightedJaccardJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text",
      weightScale: Long = 1000000L): DataFrame = {
    val lm = MetaBlocking.membership(left, idCol, textCol)
    val rm = MetaBlocking.membership(right, idCol, textCol)
    val ww = lm.select("tok").unionAll(rm.select("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"),
        greatest(lit(1L), expr(s"CAST($weightScale AS BIGINT) div cnt")).as("w"))
    val wl = lm.join(ww, Seq("tok"))
    val wr = rm.join(ww, Seq("tok"))
    def prefix(m: DataFrame): DataFrame = {
      val byRank = Window.partitionBy("id").orderBy(col("w").desc, col("tok").asc)
      m.withColumn("revcum", sum(col("w")).over(
          byRank.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("wsum", sum(col("w")).over(Window.partitionBy("id")))
        // RELATIVE epsilon (Eps·wsum, not the bare Eps): weight masses
        // reach ~scale·|tokens| ≈ 1e7-1e9, where the double rounding of
        // t·wsum alone is ~1e-7 — LARGER than an absolute 1e-9 guard,
        // so an exact-boundary pair could be over-pruned (a silent
        // completeness violation both engines would share). Scaling the
        // slack to the operand keeps it above rounding error (~1e-16
        // relative) at every magnitude while staying below the 1-unit
        // integer resolution of the mass grid.
        .filter(col("revcum").cast("double") >=
          lit(threshold) * col("wsum").cast("double") -
            lit(Eps) * col("wsum").cast("double"))
        .select("id", "tok", "wsum")
    }
    val cand = prefix(wl)
      .select(col("id").as("left_id"), col("tok"), col("wsum").as("wa"))
      .join(prefix(wr)
        .select(col("id").as("right_id"), col("tok"), col("wsum").as("wb")), Seq("tok"))
      // weight-mass length filter — prune-only; same relative slack
      .filter(col("wb").cast("double") >=
        lit(threshold) * col("wa") - lit(Eps) * col("wa").cast("double") &&
        col("wb").cast("double") <=
          col("wa").cast("double") / lit(threshold) + lit(Eps) * col("wa").cast("double"))
      .select("left_id", "right_id").distinct()
    def masses(m: DataFrame, out: String) =
      m.groupBy(col("id").as(out)).agg(sum(col("w")).cast("long").as(out + "_wsum"))
    cand
      .join(wl.select(col("id").as("left_id"), col("tok"), col("w")), Seq("left_id"))
      .join(wr.select(col("id").as("right_id"), col("tok")), Seq("right_id", "tok"))
      .groupBy("left_id", "right_id")
      .agg(sum(col("w")).cast("long").as("shared"))
      .join(masses(wl, "left_id"), Seq("left_id"))
      .join(masses(wr, "right_id"), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (col("shared").cast("double") /
          (col("left_id_wsum") + col("right_id_wsum") - col("shared")).cast("double"))
          .as("score"))
      .filter(col("score") >= lit(threshold))
  }

  /** Exact CONTAINMENT threshold join (J32): every cross-side pair
    * where at least `threshold` of the LEFT record's distinct tokens
    * appear in the right record — `|A∩B| / |A| ≥ t`. The asymmetric
    * sibling of [[simJoin]]: "find transcripts that contain ≥ t of this
    * query's tokens", robust to the right side being arbitrarily
    * longer (a property Jaccard deliberately punishes).
    *
    * Pruning is one-sided BY NECESSITY: containment places no lower
    * bound on the partner's length (a 3-token query can be fully
    * contained in a 500-token transcript), so no right-side prefix or
    * length filter can be complete. The LEFT prefix bound is the
    * classic count bound: overlap ≥ ⌈t·la⌉, so the first
    * `la − ⌈t·la⌉ + 1` rarest tokens cannot all miss B — joined against
    * the right side's FULL membership. Scale shape: the join keys are
    * still only the left prefixes' rarest tokens, and a globally rare
    * token is rare on the right too (df is computed over both sides),
    * so the full-membership side never contributes a hot key.
    *
    * @return (left_id, right_id, score) with score = |A∩B|/|A|
    */
  def containJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val lm = MetaBlocking.membership(left, idCol, textCol)
    val rm = MetaBlocking.membership(right, idCol, textCol)
    val dfq = lm.select("tok").unionAll(rm.select("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val byRank = Window.partitionBy("id").orderBy(col("cnt").asc, col("tok").asc)
    val lp = lm.join(dfq, Seq("tok"))
      .withColumn("pos", row_number().over(byRank))
      .withColumn("len", count(lit(1)).over(Window.partitionBy("id")))
      // p = la − ⌈t·la⌉ + 1, Eps-guarded exactly like candidates()
      .filter(col("pos").cast("double") <=
        col("len").cast("double") - (lit(threshold) * col("len") - lit(Eps)) + 1.0)
      .select(col("id").as("left_id"), col("tok"))
    val cand = lp
      .join(rm.select(col("id").as("right_id"), col("tok")), Seq("tok"))
      .select("left_id", "right_id").distinct()
    cand
      .join(left.select(col(idCol).as("left_id"),
        rowTokenSet(col(textCol)).as("left_id_ts")), Seq("left_id"))
      .join(right.select(col(idCol).as("right_id"),
        rowTokenSet(col(textCol)).as("right_id_ts")), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (size(array_intersect(col("left_id_ts"), col("right_id_ts"))).cast("double") /
          size(col("left_id_ts")).cast("double")).as("score"))
      .filter(col("score") >= lit(threshold))
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Exact ABSOLUTE-overlap threshold join (J33): every cross-side
    * pair sharing at least `minOverlap` distinct tokens, with the
    * overlap count. The T-overlap join underlying Ed-Join-style gram
    * filters and "at least c common rare identifiers" linkage rules —
    * the integer-threshold sibling of [[simJoin]]'s normalized scores
    * (no length normalization: a 5-token and a 500-token transcript
    * sharing c tool names qualify equally).
    *
    * Prefix bound (count form, EXACT integers — no Eps needed): order
    * each record's tokens by the global df-ascending order and keep the
    * first `len − c + 1`. Completeness: a qualifying pair's first
    * shared token w₀ (in the global order) must sit within BOTH
    * prefixes — if w₀ is outside a side's prefix, every shared token
    * sits among that side's last `c − 1` tokens, capping the overlap at
    * c − 1 < c. Records with fewer than c distinct tokens drop out of
    * the prefix stage arithmetically (len − c + 1 < 1). Positional
    * filter: overlap ≤ min(la − pa₀, lb − pb₀) + 1, pruned when below
    * c — prune-only, same-shuffle groupBy as [[simJoin]]. All counts
    * are BIGINTs, so the output hashes bit-for-bit against the DuckDB
    * mirror with no float grid anywhere.
    *
    * @return (left_id, right_id, overlap: bigint)
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      minOverlap: Int,
      idCol: String = "id",
      textCol: String = "text",
      /** false = return the lazy plan without the final eager
        * checkpoint (plan diagnostics only — BenchExtra's dump). */
      eagerResult: Boolean = true): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val c = minOverlap
    // Each side's (id, tok) membership feeds THREE consumers (the global
    // df counts, the prefix derivation, and the verify token sets) — the
    // r05 plan recomputed the tokenize/explode/distinct chain per
    // consumer. Persist both memberships for the build, materialize the
    // (candidate-bounded, tiny) result eagerly, release before returning
    // — bit-identical output, one membership computation per side (r06).
    val lm = MetaBlocking.membership(left, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rm = MetaBlocking.membership(right, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = {
      val dfq = lm.select("tok").unionAll(rm.select("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      def prefix(m: DataFrame): DataFrame = {
        val byRank = Window.partitionBy("id").orderBy(col("cnt").asc, col("tok").asc)
        m.join(dfq, Seq("tok"))
          .withColumn("pos", row_number().over(byRank))
          .withColumn("len", count(lit(1)).over(Window.partitionBy("id")))
          .filter(col("pos") <= col("len") - c + 1) // exact integer bound
          .select("id", "tok", "pos", "len")
      }
      val cand = prefix(lm)
        .select(col("id").as("left_id"), col("tok"), col("pos").as("pa"), col("len").as("la"))
        .join(prefix(rm)
          .select(col("id").as("right_id"), col("tok"), col("pos").as("pb"), col("len").as("lb")),
          Seq("tok"))
        .groupBy("left_id", "right_id", "la", "lb")
        .agg(min(col("pa")).as("pa0"), min(col("pb")).as("pb0"))
        // positional filter, integer-exact (prune-only)
        .filter(least(col("la") - col("pa0"), col("lb") - col("pb0")) + 1 >= c)
        .select("left_id", "right_id")
      // r06: the verify token sets are PER-ROW values — sorted distinct
      // tokens of the record's own text under the family's tokenizer
      // (split on ' ', drop empties). The groupBy(id) +
      // sort_array(collect_list(tok)) formulation re-aggregated the
      // exploded membership: one exchange + one ObjectHashAggregate per
      // side for arrays that a fused single-pass expression
      // ([[graft.similarity.SortedTokenSet]] spaceOnly) computes with
      // ZERO shuffle, element-identical for unique-id inputs (which the
      // family's id contract — one record per id — already requires;
      // the DuckDB mirrors group by id the same way). Guide §2.4.
      def sets(src: DataFrame, side: String) =
        src.select(col(idCol).as(side + "_id"),
          rowTokenSet(col(textCol)).as(side + "_ts"))
      cand
        .join(sets(left, "left"), Seq("left_id"))
        .join(sets(right, "right"), Seq("right_id"))
        .select(col("left_id"), col("right_id"),
          size(array_intersect(col("left_ts"), col("right_ts"))).cast("bigint").as("overlap"))
        .filter(col("overlap") >= c)
    }
    if (!eagerResult) result
    else try result.localCheckpoint(true)
    finally { lm.unpersist(blocking = false); rm.unpersist(blocking = false) }
  }

  /** Full mirror of [[simJoin]] from normalized sides `ln(id, t)` /
    * `rn(id, t)`, as a CTE chain ending in a CTE named `out` instead of
    * a final SELECT — lets downstream oracles (the J37 matcher
    * generator) continue the WITH list from the thresholded pair set;
    * [[simJoinSqlDuck]] appends the final SELECT for standalone use.
    * Same arithmetic shape as the Spark side — exact-integer counts,
    * the one double division/sqrt last — so results hash bit-for-bit.
    * The prefix factor is computed HERE (same IEEE double as the Spark
    * side) and inlined via its shortest-roundtrip literal. */
  def simJoinCteSqlDuck(threshold: Double, sim: String, out: String): String = {
    val t = s"CAST($threshold AS DOUBLE)"
    val f = s"CAST(${prefixFactor(sim, threshold)} AS DOUBLE)"
    val inter = "len(list_intersect(a.ts, b.ts))"
    val scoreSql = sim match {
      case "jaccard" => s"CAST($inter AS DOUBLE) / CAST(c.la + c.lb - $inter AS DOUBLE)"
      case "cosine"  => s"CAST($inter AS DOUBLE) / sqrt(CAST(c.la AS DOUBLE) * CAST(c.lb AS DOUBLE))"
      case _         => s"CAST(2.0 AS DOUBLE) * CAST($inter AS DOUBLE) / CAST(c.la + c.lb AS DOUBLE)"
    }
    s"""ssl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |ssr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |ssdf AS (SELECT tok, count(*) AS cnt FROM
       |  (SELECT tok FROM ssl UNION ALL SELECT tok FROM ssr) GROUP BY tok),
       |sslp AS (SELECT id, tok, len FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM ssl m JOIN ssdf d ON m.tok = d.tok)
       |  WHERE CAST(pos AS DOUBLE) <= CAST(len AS DOUBLE) - ($f * len - 1e-9) + 1.0),
       |ssrp AS (SELECT id, tok, len FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM ssr m JOIN ssdf d ON m.tok = d.tok)
       |  WHERE CAST(pos AS DOUBLE) <= CAST(len AS DOUBLE) - ($f * len - 1e-9) + 1.0),
       |sscand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id,
       |                 l.len AS la, r.len AS lb
       |  FROM sslp l JOIN ssrp r ON l.tok = r.tok
       |  WHERE CAST(r.len AS DOUBLE) >= $f * l.len - 1e-9
       |    AND CAST(r.len AS DOUBLE) <= CAST(l.len AS DOUBLE) / $f + 1e-9),
       |sslset AS (SELECT id, list_sort(list(tok)) AS ts FROM ssl GROUP BY id),
       |ssrset AS (SELECT id, list_sort(list(tok)) AS ts FROM ssr GROUP BY id),
       |$out AS (SELECT left_id, right_id, score FROM (
       |  SELECT c.left_id, c.right_id, $scoreSql AS score
       |  FROM sscand c
       |  JOIN sslset a ON c.left_id = a.id
       |  JOIN ssrset b ON c.right_id = b.id)
       |WHERE score >= $t)""".stripMargin
  }

  def simJoinSqlDuck(threshold: Double, sim: String = "jaccard"): String =
    simJoinCteSqlDuck(threshold, sim, "ssout") +
      "\nSELECT left_id, right_id, score FROM ssout"

  /** Jaccard mirror — kept for the m_setsim_pf oracle wiring. */
  def jaccardJoinSqlDuck(threshold: Double): String =
    simJoinSqlDuck(threshold, "jaccard")

  /** Full mirror of [[weightedCosineJoin]] from `ln(id, t)` / `rn(id,
    * t)`. Same integer weight grid, same norm-based prefix bound with
    * the same Scala-computed t² literal, the one double division last —
    * results hash bit-for-bit. */
  def weightedCosineJoinSqlDuck(
      threshold: Double, weightScale: Long = 1000000L): String = {
    val t = s"CAST($threshold AS DOUBLE)"
    val t2 = s"CAST(${threshold * threshold} AS DOUBLE)"
    def prefixCte(name: String, src: String) =
      s"""$name AS (SELECT id, tok FROM (
         |  SELECT id, tok,
         |         sum(w*w) OVER (PARTITION BY id ORDER BY w DESC, tok ASC
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS revcum,
         |         sum(w*w) OVER (PARTITION BY id) AS nsq
         |  FROM $src)
         |  WHERE CAST(revcum AS DOUBLE)
         |    >= $t2 * CAST(nsq AS DOUBLE) - 1e-9 * CAST(nsq AS DOUBLE))""".stripMargin
    s"""wsl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |wsr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |ww AS (SELECT tok, GREATEST(CAST(1 AS BIGINT),
       |         CAST($weightScale AS BIGINT) // count(*)) AS w FROM
       |  (SELECT tok FROM wsl UNION ALL SELECT tok FROM wsr) GROUP BY tok),
       |wml AS (SELECT m.id, m.tok, d.w FROM wsl m JOIN ww d ON m.tok = d.tok),
       |wmr AS (SELECT m.id, m.tok, d.w FROM wsr m JOIN ww d ON m.tok = d.tok),
       |${prefixCte("wpl", "wml")},
       |${prefixCte("wpr", "wmr")},
       |wcand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
       |  FROM wpl l JOIN wpr r ON l.tok = r.tok),
       |wnl AS (SELECT id, CAST(sum(w*w) AS BIGINT) AS nsq FROM wml GROUP BY id),
       |wnr AS (SELECT id, CAST(sum(w*w) AS BIGINT) AS nsq FROM wmr GROUP BY id),
       |wdot AS (SELECT c.left_id, c.right_id, CAST(sum(a.w * b.w) AS BIGINT) AS dot
       |  FROM wcand c
       |  JOIN wml a ON a.id = c.left_id
       |  JOIN wmr b ON b.id = c.right_id AND b.tok = a.tok
       |  GROUP BY c.left_id, c.right_id)
       |SELECT left_id, right_id, score FROM (
       |  SELECT d.left_id, d.right_id,
       |         CAST(d.dot AS DOUBLE)
       |           / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) AS score
       |  FROM wdot d
       |  JOIN wnl na ON d.left_id = na.id
       |  JOIN wnr nb ON d.right_id = nb.id)
       |WHERE score >= $t""".stripMargin
  }

  /** Exact OVERLAP-COEFFICIENT threshold join (J35): every cross-side
    * pair with `|A∩B| / min(|A|,|B|) ≥ t` — the Szymkiewicz–Simpson
    * coefficient, the symmetric closure of [[containJoin]] (a pair
    * qualifies when EITHER side is t-contained in the other; any
    * subset relationship scores 1.0 regardless of the size gap, the
    * case Jaccard and Dice deliberately punish).
    *
    * Pruning: the count bound `overlap ≥ ⌈t·len⌉` holds only for the
    * SHORTER side — the coefficient places no lower bound on the
    * longer partner's overlap fraction, and which side is shorter is
    * a per-pair fact unknown at generation time. So candidates are
    * the UNION of two one-sided legs, each complete for the pairs
    * whose min is on its side: left-prefix × right-full (complete
    * when |A| ≤ |B| — the min side's t-prefix must hit the partner)
    * and left-full × right-prefix (the mirror; equal lengths are
    * caught by both). No length filter exists (any ratio qualifies),
    * same as containment. Join keys stay cold: each leg keys on one
    * side's RAREST tokens under the global df order. Exact
    * verification per candidate; one distinct over the unioned legs.
    *
    * @return (left_id, right_id, score) with score = |A∩B|/min(|A|,|B|)
    */
  def overlapCoeffJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val lm = MetaBlocking.membership(left, idCol, textCol)
    val rm = MetaBlocking.membership(right, idCol, textCol)
    val dfq = lm.select("tok").unionAll(rm.select("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val byRank = Window.partitionBy("id").orderBy(col("cnt").asc, col("tok").asc)
    def prefix(m: DataFrame): DataFrame =
      m.join(dfq, Seq("tok"))
        .withColumn("pos", row_number().over(byRank))
        .withColumn("len", count(lit(1)).over(Window.partitionBy("id")))
        .filter(col("pos").cast("double") <=
          col("len").cast("double") - (lit(threshold) * col("len") - lit(Eps)) + 1.0)
        .select("id", "tok")
    def leg(l: DataFrame, r: DataFrame) =
      l.select(col("id").as("left_id"), col("tok"))
        .join(r.select(col("id").as("right_id"), col("tok")), Seq("tok"))
        .select("left_id", "right_id")
    val cand = leg(prefix(lm), rm).unionAll(leg(lm, prefix(rm))).distinct()
    cand
      .join(left.select(col(idCol).as("left_id"),
        rowTokenSet(col(textCol)).as("left_id_ts")), Seq("left_id"))
      .join(right.select(col(idCol).as("right_id"),
        rowTokenSet(col(textCol)).as("right_id_ts")), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (size(array_intersect(col("left_id_ts"), col("right_id_ts"))).cast("double") /
          least(size(col("left_id_ts")), size(col("right_id_ts"))).cast("double"))
          .as("score"))
      .filter(col("score") >= lit(threshold))
  }

  /** Full mirror of [[weightedJaccardJoin]] from `ln(id, t)` /
    * `rn(id, t)`: same integer weight grid, same weight-mass prefix
    * bound (Eps-guarded like the Spark side), the one double division
    * last — results hash bit-for-bit. */
  def weightedJaccardJoinSqlDuck(
      threshold: Double, weightScale: Long = 1000000L): String = {
    val t = s"CAST($threshold AS DOUBLE)"
    def prefixCte(name: String, src: String) =
      s"""$name AS (SELECT id, tok, wsum FROM (
         |  SELECT id, tok,
         |         sum(w) OVER (PARTITION BY id ORDER BY w DESC, tok ASC
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS revcum,
         |         sum(w) OVER (PARTITION BY id) AS wsum
         |  FROM $src)
         |  WHERE CAST(revcum AS DOUBLE)
         |    >= $t * CAST(wsum AS DOUBLE) - 1e-9 * CAST(wsum AS DOUBLE))""".stripMargin
    s"""wjl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |wjr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |wjw AS (SELECT tok, GREATEST(CAST(1 AS BIGINT),
       |         CAST($weightScale AS BIGINT) // count(*)) AS w FROM
       |  (SELECT tok FROM wjl UNION ALL SELECT tok FROM wjr) GROUP BY tok),
       |wjml AS (SELECT m.id, m.tok, d.w FROM wjl m JOIN wjw d ON m.tok = d.tok),
       |wjmr AS (SELECT m.id, m.tok, d.w FROM wjr m JOIN wjw d ON m.tok = d.tok),
       |${prefixCte("wjpl", "wjml")},
       |${prefixCte("wjpr", "wjmr")},
       |wjcand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
       |  FROM wjpl l JOIN wjpr r ON l.tok = r.tok
       |  WHERE CAST(r.wsum AS DOUBLE)
       |      >= $t * l.wsum - 1e-9 * CAST(l.wsum AS DOUBLE)
       |    AND CAST(r.wsum AS DOUBLE)
       |      <= CAST(l.wsum AS DOUBLE) / $t + 1e-9 * CAST(l.wsum AS DOUBLE)),
       |wjma AS (SELECT id, CAST(sum(w) AS BIGINT) AS wsum FROM wjml GROUP BY id),
       |wjmb AS (SELECT id, CAST(sum(w) AS BIGINT) AS wsum FROM wjmr GROUP BY id),
       |wjsh AS (SELECT c.left_id, c.right_id, CAST(sum(a.w) AS BIGINT) AS shared
       |  FROM wjcand c
       |  JOIN wjml a ON a.id = c.left_id
       |  JOIN wjmr b ON b.id = c.right_id AND b.tok = a.tok
       |  GROUP BY c.left_id, c.right_id)
       |SELECT left_id, right_id, score FROM (
       |  SELECT s.left_id, s.right_id,
       |         CAST(s.shared AS DOUBLE)
       |           / CAST(na.wsum + nb.wsum - s.shared AS DOUBLE) AS score
       |  FROM wjsh s
       |  JOIN wjma na ON s.left_id = na.id
       |  JOIN wjmb nb ON s.right_id = nb.id)
       |WHERE score >= $t""".stripMargin
  }

  /** Full mirror of [[overlapJoin]] from `ln(id, t)` / `rn(id, t)`:
    * same df-ascending prefix (pure-integer bound, no epsilon), DISTINCT
    * candidates (the positional filter is prune-only — output
    * invariant), exact |A∩B| ≥ c verification. */
  def overlapJoinSqlDuck(minOverlap: Int): String = {
    val c = minOverlap
    s"""ovl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |ovr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |ovdf AS (SELECT tok, count(*) AS cnt FROM
       |  (SELECT tok FROM ovl UNION ALL SELECT tok FROM ovr) GROUP BY tok),
       |ovlp AS (SELECT id, tok FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM ovl m JOIN ovdf d ON m.tok = d.tok)
       |  WHERE pos <= len - $c + 1),
       |ovrp AS (SELECT id, tok FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM ovr m JOIN ovdf d ON m.tok = d.tok)
       |  WHERE pos <= len - $c + 1),
       |ovcand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
       |  FROM ovlp l JOIN ovrp r ON l.tok = r.tok),
       |ovlset AS (SELECT id, list_sort(list(tok)) AS ts FROM ovl GROUP BY id),
       |ovrset AS (SELECT id, list_sort(list(tok)) AS ts FROM ovr GROUP BY id)
       |SELECT left_id, right_id, overlap FROM (
       |  SELECT c.left_id, c.right_id,
       |         CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS overlap
       |  FROM ovcand c
       |  JOIN ovlset a ON c.left_id = a.id
       |  JOIN ovrset b ON c.right_id = b.id)
       |WHERE overlap >= $c""".stripMargin
  }

  /** Full mirror of [[overlapCoeffJoin]] from `ln(id, t)` / `rn(id,
    * t)`: same two one-sided prefix legs unioned (Eps-guarded count
    * bound), exact |A∩B|/min verification. */
  def overlapCoeffJoinSqlDuck(threshold: Double): String = {
    val t = s"CAST($threshold AS DOUBLE)"
    def prefixCte(name: String, src: String) =
      s"""$name AS (SELECT id, tok FROM
         |  (SELECT m.id, m.tok,
         |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
         |          count(*) OVER (PARTITION BY m.id) AS len
         |   FROM $src m JOIN ocdf d ON m.tok = d.tok)
         |  WHERE CAST(pos AS DOUBLE) <= CAST(len AS DOUBLE) - ($t * len - 1e-9) + 1.0)""".stripMargin
    s"""ocl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |ocr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |ocdf AS (SELECT tok, count(*) AS cnt FROM
       |  (SELECT tok FROM ocl UNION ALL SELECT tok FROM ocr) GROUP BY tok),
       |${prefixCte("oclp", "ocl")},
       |${prefixCte("ocrp", "ocr")},
       |occand AS (SELECT DISTINCT left_id, right_id FROM (
       |  SELECT l.id AS left_id, r.id AS right_id FROM oclp l JOIN ocr r ON l.tok = r.tok
       |  UNION ALL
       |  SELECT l.id AS left_id, r.id AS right_id FROM ocl l JOIN ocrp r ON l.tok = r.tok)),
       |oclset AS (SELECT id, list_sort(list(tok)) AS ts FROM ocl GROUP BY id),
       |ocrset AS (SELECT id, list_sort(list(tok)) AS ts FROM ocr GROUP BY id)
       |SELECT left_id, right_id, score FROM (
       |  SELECT c.left_id, c.right_id,
       |         CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
       |           / CAST(LEAST(len(a.ts), len(b.ts)) AS DOUBLE) AS score
       |  FROM occand c
       |  JOIN oclset a ON c.left_id = a.id
       |  JOIN ocrset b ON c.right_id = b.id)
       |WHERE score >= $t""".stripMargin
  }

  /** Full mirror of [[containJoin]] from `ln(id, t)` / `rn(id, t)`:
    * left prefix (count bound, Eps-guarded) joined to the right side's
    * FULL membership, exact |A∩B|/|A| verification. */
  def containJoinSqlDuck(threshold: Double): String = {
    val t = s"CAST($threshold AS DOUBLE)"
    s"""csl AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |csr AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |csdf AS (SELECT tok, count(*) AS cnt FROM
       |  (SELECT tok FROM csl UNION ALL SELECT tok FROM csr) GROUP BY tok),
       |cslp AS (SELECT id, tok FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM csl m JOIN csdf d ON m.tok = d.tok)
       |  WHERE CAST(pos AS DOUBLE) <= CAST(len AS DOUBLE) - ($t * len - 1e-9) + 1.0),
       |cscand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
       |  FROM cslp l JOIN csr r ON l.tok = r.tok),
       |cslset AS (SELECT id, list_sort(list(tok)) AS ts FROM csl GROUP BY id),
       |csrset AS (SELECT id, list_sort(list(tok)) AS ts FROM csr GROUP BY id)
       |SELECT left_id, right_id, score FROM (
       |  SELECT c.left_id, c.right_id,
       |         CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
       |           / CAST(len(a.ts) AS DOUBLE) AS score
       |  FROM cscand c
       |  JOIN cslset a ON c.left_id = a.id
       |  JOIN csrset b ON c.right_id = b.id)
       |WHERE score >= $t""".stripMargin
  }
}

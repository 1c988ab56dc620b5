package graft.blocking

import org.apache.spark.sql.DataFrame
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

  /** Exact Jaccard-threshold join: every (`left` id, `right` id) pair
    * whose distinct-whitespace-token Jaccard is ≥ `threshold`, with the
    * score. Records with no tokens never match (J undefined → dropped,
    * consistent with their empty membership).
    *
    * @return (left_id, right_id, jaccard)
    */
  def jaccardJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
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
        // p = len − ceil(t·len) + 1 (per-side overlap bound α = ceil(t·len))
        .filter(col("pos") <= col("len") - ceil(lit(threshold) * col("len")) + 1)
        .select("id", "tok", "len")
    }
    val cand = prefix(lm)
      .select(col("id").as("left_id"), col("tok"), col("len").as("la"))
      .join(prefix(rm)
        .select(col("id").as("right_id"), col("tok"), col("len").as("lb")), Seq("tok"))
      // length filter — prune-only (verification is exact either way):
      // J ≥ t forces t·la ≤ overlap ≤ lb and lb ≤ la/t.
      .filter(col("lb") >= ceil(lit(threshold) * col("la")) &&
        col("lb").cast("double") <= col("la").cast("double") / lit(threshold))
      .select("left_id", "right_id", "la", "lb")
      .distinct()
    // Verification: exact Jaccard against pre-collected token arrays —
    // per-candidate cost, the corpus is never re-shuffled.
    def sets(m: DataFrame, side: String) =
      m.groupBy(col("id").as(side + "_id"))
        .agg(sort_array(collect_list(col("tok"))).as(side + "_ts"))
    val inter = size(array_intersect(col("l_ts"), col("r_ts")))
    cand
      .join(sets(lm, "l").withColumnRenamed("l_id", "left_id"), Seq("left_id"))
      .join(sets(rm, "r").withColumnRenamed("r_id", "right_id"), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (inter.cast("double") /
          (col("la") + col("lb") - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Full mirror of [[jaccardJoin]] from normalized sides `ln(id, t)` /
    * `rn(id, t)`: CTE chain + final SELECT (left_id, right_id, jaccard).
    * Same arithmetic shape — exact-integer counts, one double quotient —
    * so results hash bit-for-bit. */
  def jaccardJoinSqlDuck(threshold: Double): String = {
    val t = s"CAST($threshold AS DOUBLE)"
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
       |  WHERE pos <= len - CAST(ceil($t * len) AS BIGINT) + 1),
       |ssrp AS (SELECT id, tok, len FROM
       |  (SELECT m.id, m.tok,
       |          row_number() OVER (PARTITION BY m.id ORDER BY d.cnt ASC, m.tok ASC) AS pos,
       |          count(*) OVER (PARTITION BY m.id) AS len
       |   FROM ssr m JOIN ssdf d ON m.tok = d.tok)
       |  WHERE pos <= len - CAST(ceil($t * len) AS BIGINT) + 1),
       |sscand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id,
       |                 l.len AS la, r.len AS lb
       |  FROM sslp l JOIN ssrp r ON l.tok = r.tok
       |  WHERE r.len >= CAST(ceil($t * l.len) AS BIGINT)
       |    AND CAST(r.len AS DOUBLE) <= CAST(l.len AS DOUBLE) / $t),
       |sslset AS (SELECT id, list_sort(list(tok)) AS ts FROM ssl GROUP BY id),
       |ssrset AS (SELECT id, list_sort(list(tok)) AS ts FROM ssr GROUP BY id)
       |SELECT left_id, right_id, jaccard FROM (
       |  SELECT c.left_id, c.right_id,
       |         CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
       |         CAST(c.la + c.lb - len(list_intersect(a.ts, b.ts)) AS DOUBLE) AS jaccard
       |  FROM sscand c
       |  JOIN sslset a ON c.left_id = a.id
       |  JOIN ssrset b ON c.right_id = b.id)
       |WHERE jaccard >= $t""".stripMargin
  }
}

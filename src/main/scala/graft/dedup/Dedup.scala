package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines —
  * the reference's exact dedup family (D1-D3,
  * clean_and_parse.py:264-273, suspiciousclean.py:48-54) plus the
  * scale path: MinHash-LSH, SimHash and n-gram Jaccard near-dup
  * detection, all in pure Column expressions (no ml.feature, no RDDs).
  *
  * Portable hashing: `h_seed(s) = first 60 bits of md5(seed || ':' || s)`
  * — identical in Spark (`conv(substr(md5(..),1,15),16,10)`) and DuckDB
  * (`CAST('0x' || substr(md5(..),1,15) AS BIGINT)`), so every stage has
  * a DuckDB oracle. 60 bits keeps the value positive in a signed int64.
  *
  * Scale notes (100 TB): exact dedup is a single hash-shuffle on the
  * 16-byte digest (never on the full text); MinHash-LSH is
  * explode(bands) -> shuffle on (band, key) -> within-bucket pairing,
  * with bucket size capped by the band width choice; all signatures are
  * computed map-side in one pass over the text.
  */
object Dedup {

  /** 60-bit md5-derived hash, seedable for independent hash functions.
    * r06: [[Md5Prefix60]] computes the same value without the
    * hex-string/`conv` round-trip (bit-identical, spec-tested); the
    * DuckDB mirror below is untouched. */
  def portableHash(c: Column, seed: Int): Column =
    org.apache.spark.sql.GraftShim.column(Md5Prefix60(
      org.apache.spark.sql.GraftShim.expression(concat(lit(s"$seed:"), c))))

  def portableHashSqlDuck(e: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $e), 1, 15)) AS BIGINT)"

  // -- D1-D3: the reference's dedup family --------------------------------

  /** D1 (clean_and_parse.py:264-267): exact full-row dedup. */
  def exactRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** D2 (clean_and_parse.py:269-273) with a deterministic keeper: the
    * pandas `keep="first"` depends on file order; distributed we pin
    * "first" = smallest id (SURVEY.md §2.5). */
  def byKeyDeterministic(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** D3 (clean_and_parse.py:215): duplicated(keep=False) flag. */
  def dupFlag(df: DataFrame, keyCols: Seq[String], flagCol: String): DataFrame =
    df.withColumn(flagCol,
      (count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)) > 1).cast("int"))

  // -- shingling / MinHash -------------------------------------------------

  /** Character k-shingles (distinct) of a string column. Strings
    * shorter than k yield an EMPTY array; null in -> null out.
    * r06: a single-pass codegen'd expression ([[CharShingles]]) —
    * element-for-element identical to the previous
    * `array_distinct(transform(sequence(1, n), i => substr(c, i, k)))`
    * HOF chain (distinct in first-occurrence order, codepoint
    * semantics), which was interpreted per element and measured ~10×
    * the cost of the scan it decorates (equivalence spec-tested). */
  def shingles(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      CharShingles(org.apache.spark.sql.GraftShim.expression(c), k))

  /** TOKEN q-gram shingles (distinct): q-grams over whitespace tokens,
    * re-joined by a single space — the north-star's "token q-grams"
    * reading, where [[shingles]] is the character k-gram reading.
    * Fewer than q tokens yields an EMPTY array; null in -> null out.
    * Tokenization matches the scorer family's (split on `\s+`, empties
    * dropped), so the same normalization governs both. */
  def tokenShingles(c: Column, q: Int): Column = {
    val toks = filter(split(c, "\\s+"), t => t =!= "")
    val n = size(toks) - (q - 1)
    when(c.isNull, lit(null).cast("array<string>"))
      .when(n >= 1,
        array_distinct(transform(sequence(lit(1), n),
          i => array_join(slice(toks, i, lit(q)), " "))))
      .otherwise(lit(Array.empty[String]))
  }

  /** DuckDB mirror of [[tokenShingles]], for
    * [[minhashBandsSqlDuck]]'s `shingleSqlOverride`. */
  def tokenShinglesSqlDuck(textCol: String, q: Int): String = {
    val toks = s"list_filter(string_split_regex($textCol, '\\s+'), t -> t <> '')"
    s"""list_distinct(list_transform(generate_series(1, greatest(len($toks)-${q - 1}, 0)),
       |                             i -> array_to_string(($toks)[i:i+${q - 1}], ' ')))""".stripMargin
      .replaceAll("\n\\s*", " ")
  }

  /** Seeded 60-bit hash family over ONE md5-derived base hash:
    * h_seed(s) = xorshift60(h0(s) XOR C_seed), with h0 = first 60 bits
    * of md5(s) and C_seed a fixed 60-bit constant per seed (md5 of the
    * seed, computed once driver-side and inlined as a literal array).
    * One md5 per shingle instead of one per (shingle, seed) — at
    * 10^12-shingle scale the md5 dominates the signature stage, and
    * the mix is six xor/shift/mask ops.
    *
    * Base-hash collisions are perfectly CORRELATED across seeds (two
    * shingles colliding in h0 collide under every seed — the price of
    * the single-md5 family), which is why the family keeps ALL 60 md5
    * bits: the xorshift steps are bijections on [0, 2^60) (each is an
    * invertible GF(2) linear map), so the per-seed hash introduces ZERO
    * collisions beyond h0's own — and at 2^60 even 10^9 distinct
    * shingles expect < 1 colliding pair. (An earlier mod-(2^31−1)
    * Carter-Wegman reduction respected int64 arithmetic but kept only
    * 31 bits — at 10^9 shingles that's ~0.2 expected collisions PER
    * SHINGLE, all correlated across seeds.)
    *
    * Portability: left shifts are pre-masked (`(x & 2^(60−s)−1) << s`
    * ≡ `(x << s) & mask60` with every intermediate < 2^60 < 2^63), so
    * the identical expressions run overflow-free under Spark's ANSI
    * mode and DuckDB's checked BIGINT, and the oracle mirrors the
    * arithmetic digit for digit. */
  val mhMask60 = (1L << 60) - 1
  /** Per-seed xor constants: first 60 bits of md5("mh:<seed>"). */
  val mhSeedConsts: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 64).map { seed =>
      val hex = md.digest(s"mh:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }.toArray
  }
  private def mhMix(seed: Column, h0: Column): Column = {
    val c = element_at(lit(mhSeedConsts), (seed + 1).cast("int"))
    val x0 = h0.bitwiseXOR(c)
    // premasks derived from mask60: (x << s) & mask60 without overflow
    val x1 = x0.bitwiseXOR(shiftleft(x0.bitwiseAND(lit(mhMask60 >> 13)), 13))
    val x2 = x1.bitwiseXOR(shiftright(x1, 29))
    x2.bitwiseXOR(shiftleft(x2.bitwiseAND(lit(mhMask60 >> 17)), 17))
  }
  private def requireSeeds(numHashes: Int): Unit =
    require(numHashes <= mhSeedConsts.length,
      s"numHashes=$numHashes exceeds the ${mhSeedConsts.length} precomputed " +
        "seed constants (element_at would throw under ANSI mode); extend mhSeedConsts")
  def baseHash60(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(Md5Prefix60(
      org.apache.spark.sql.GraftShim.expression(c)))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min hash over the shingle set. Empty shingle set -> nulls. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    requireSeeds(numHashes)
    val h0s = transform(shingleCol, (s: Column) => baseHash60(s))
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(h0s, h0 => mhMix(seed.cast("long"), h0))))
  }

  /** LSH band keys: signature split into `bands` bands of equal width;
    * key = md5 of the band's joined values. Two docs sharing any band
    * key are candidates. */
  def bandKeys(sigCol: Column, bands: Int, numHashes: Int): Column = {
    // a non-dividing bands count would silently ignore the trailing
    // signature elements (and diverge from the DuckDB mirror, which
    // rejects it at construction) — fail fast instead
    require(bands > 0 && numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes")
    val rowsPerBand = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat(b.cast("string"), lit("|"),
        md5(concat_ws("_",
          transform(slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand)), v => v.cast("string"))))))
  }

  /** DuckDB mirror of the shingle → signature → band-key chain, as a
    * reusable CTE body: emits `<p>sh / <p>hs / <p>sig / <p>bands`
    * definitions (prefix `p` avoids collisions with the caller's CTEs);
    * the final relation `<p>bands` carries ($idCol, $carryCols...,
    * $textCol, band) with one row per (row, band key). Arithmetic is
    * digit-for-digit [[shingles]] + [[minhashSignature]] + [[bandKeys]]
    * (same premasked xorshift steps, same per-seed constants), so any
    * oracle built on it hashes against the Spark side bit-for-bit —
    * shared by the LSH-blocked match oracle (SparkEntry `m_match_lsh`,
    * `m_match_comp`) and the dedup oracles (`keepShingles = true`
    * carries the shingle set through to the final relation for the
    * exact-Jaccard verify join). */
  def minhashBandsSqlDuck(
      fromRelation: String, idCol: String, textCol: String,
      carryCols: Seq[String], k: Int, numHashes: Int, bands: Int,
      p: String = "mb_", keepShingles: Boolean = false,
      shingleSqlOverride: Option[String] = None): String = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    requireSeeds(numHashes)
    val rpb = numHashes / bands
    val consts = mhSeedConsts.take(numHashes).mkString("[", ", ", "]")
    // the sh CTE COMPUTES the shingle column, so it carries only the
    // caller's columns; downstream CTEs add sh when keepShingles
    val carry0 = carryCols.map(c => s"$c, ").mkString
    val carry = carry0 + (if (keepShingles) "sh, " else "")
    // default: character k-shingles ([[shingles]]); override for other
    // shingle families (e.g. [[tokenShinglesSqlDuck]])
    val shingleSql = shingleSqlOverride.getOrElse(
      s"""list_distinct(list_transform(generate_series(1, greatest(length($textCol)-${k - 1}, 0)),
         |                       i -> substring($textCol, CAST(i AS INT), $k)))""".stripMargin)
    s"""${p}sh AS (
       |  SELECT $idCol, $carry0$textCol,
       |         $shingleSql AS sh
       |  FROM $fromRelation
       |), ${p}hs AS (
       |  SELECT $idCol, $carry$textCol,
       |         list_transform(sh, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
       |  FROM ${p}sh WHERE len(sh) > 0
       |), ${p}sig AS (
       |  SELECT $idCol, $carry$textCol,
       |         list_transform(generate_series(0, ${numHashes - 1}), seed ->
       |           list_min(
       |             list_transform(
       |               list_transform(
       |                 list_transform(
       |                   list_transform(hs, h -> xor(h, $consts[CAST(seed+1 AS INT)])),
       |                   x -> xor(x, (x & ${mhMask60 >> 13}) << 13)),
       |                 x -> xor(x, x >> 29)),
       |               x -> xor(x, (x & ${mhMask60 >> 17}) << 17)))) AS sig
       |  FROM ${p}hs
       |), ${p}bands AS (
       |  SELECT $idCol, $carry$textCol,
       |         unnest(list_transform(generate_series(0, ${bands - 1}), b ->
       |           CAST(b AS STRING) || '|' ||
       |           md5(array_to_string(list_transform(sig[CAST(b*$rpb+1 AS INT):CAST(b*$rpb+$rpb AS INT)],
       |                                              x -> CAST(x AS STRING)), '_')))) AS band
       |  FROM ${p}sig
       |)""".stripMargin
  }

  /** End-to-end MinHash-LSH near-dup candidate pairs with exact n-gram
    * Jaccard verification. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard >= threshold.
    *
    * Shuffle plan: one explode+shuffle on band key (candidate gen),
    * dedup of pairs, then a self-join on id to re-attach shingles for
    * the exact verify — at scale the verify join is the expensive part
    * and is bounded by the LSH candidate count, not n².
    */
  /** Relational MinHash signature: explode shingles, hash each once per
    * seed (codegen'd row-at-a-time, no nested interpreted HOFs), partial
    * min aggregation map-side, then reassemble the ordered signature
    * array. Produces exactly the same signatures as
    * [[minhashSignature]] (same seeded hash), but scales: the per-row
    * work is flat expressions and the min-agg combines map-side, so the
    * shuffle carries one (id, seed, min) row per band-hash, not the
    * shingle sets. */
  def minhashSignatureRelational(
      withShingles: DataFrame, numHashes: Int): DataFrame = {
    requireSeeds(numHashes)
    // One row per (id, shingle); each of the numHashes seeds is a
    // SEPARATE min-aggregate column over the same h0 — not a seed
    // explode. The r05 shape exploded numHashes rows per shingle and
    // min-aggregated on (id, seed): 16× the rows through the hash
    // aggregate plus a second (id)-keyed agg to reassemble the array.
    // Flat min columns keep the row count at one per shingle, combine
    // map-side identically (partial min per agg column), and the
    // signature array falls out of one aggregation — same seeded
    // arithmetic (mhMix with the per-seed constant inlined as a
    // literal), bit-identical signatures.
    val perShingle = withShingles.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), baseHash60(col("s")).as("h0")) // md5 ONCE per shingle
    val minCols = (0 until numHashes).map(seed =>
      min(mhMix(lit(seed.toLong), col("h0"))).as(s"__mh$seed"))
    perShingle.groupBy("id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"__mh$i")): _*).as("sig"))
  }

  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      jaccardThreshold: Double = 0.6,
      /** false = return the lazy plan without the final eager
        * checkpoint (plan diagnostics only — BenchExtra's dump; the
        * shingle cache then stays unpersisted-by-action but also
        * unmaterialized, so nothing pins). */
      eagerResult: Boolean = true): DataFrame = {
    // ONE shingle pass for the whole query (r06). The shingle set feeds
    // three consumers — the signature derivation and BOTH sides of the
    // exact-Jaccard verify join — and the r05 plan recomputed the
    // scan + k-shingle HOF chain (the query's single most expensive
    // per-row expression) once per consumer. Persist the slim (id, sh)
    // projection for the duration of the build, materialize the final
    // pair set eagerly (it is candidate-bounded and tiny relative to
    // the corpus), and release the cache before returning — callers
    // get a checkpoint-backed frame and executor storage is clean.
    // Results are bit-identical (caching/checkpointing change nothing).
    // the corpus usually arrives as a handful of size-based scan
    // partitions — spread the raw (id, text) rows first so the k-shingle
    // chain (the dominant per-row cost) runs on every core, not on the
    // scan's task count (guide §2.5); cores-tracking partition count
    // (compute-bound spread, see [[graft.util.Parallelism.spread]])
    val parts = graft.util.Parallelism.spread(df.sparkSession)
    val withShingles = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(parts)
      .withColumn("sh", shingles(col("t"), k))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band keys need only the signature — the r05 shape also joined
    // (id, sh) back in here, paying an id-keyed shuffle of the shingle
    // arrays for a column the candidate generation never reads
    val withBands = minhashSignatureRelational(withShingles, numHashes)
      .withColumn("band", explode(bandKeys(col("sig"), bands, numHashes)))
      .select(col("id"), col("band"))
    val cands = withBands.as("a").join(withBands.as("b"), Seq("band"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val pairs = cands
      .join(withShingles.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(withShingles.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    if (!eagerResult) pairs
    else try pairs.localCheckpoint(true)
    finally withShingles.unpersist(blocking = false)
  }

  /** The full fuzzy-dedup pipeline (the shape production corpus dedup
    * runs at 100 TB — cf. C4/RefinedWeb: near-dup pairs → transitive
    * closure → one keeper per duplicate cluster): [[minhashLshPairs]]
    * over the corpus, large-star/small-star connected components over
    * the pair graph, keeper = the cluster's minimum doc id. Every input
    * doc comes back — singletons (no near-dup edge) are their own
    * cluster — with `cluster_id` and a `kept` 0/1 flag, so the dedup'd
    * corpus is `filter(kept = 1)` and the dup-mapping table is the rest.
    *
    * Scale shape: pairs are bucketed (never all-pairs), CC is O(log n)
    * rounds of two shuffles each, the final assembly is one left join
    * on doc id. Storage hygiene: the CC intermediate (an eager
    * localCheckpoint [[graft.cluster.ConnectedComponents.run]] returns
    * pinned in executor storage) is FREED here — the returned frame is
    * itself eagerly checkpointed first, which truncates its lineage
    * past the CC blocks, so per call exactly one narrow
    * (doc_id, cluster_id, kept) frame stays pinned and callers that
    * loop (re-dedup per snapshot in a long session) release it with
    * `CheckpointHygiene.free(result)` once the kept set is committed,
    * exactly as [[graft.pipeline.Pipeline]] does for clusters. */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      jaccardThreshold: Double = 0.6): DataFrame = {
    // pairs is checkpoint-backed (minhashLshPairs materializes eagerly,
    // r06) — freed below once the assembled result is itself checkpointed
    val pairs = minhashLshPairs(df, idCol, textCol, k, numHashes, bands, jaccardThreshold)
    val cc = graft.cluster.ConnectedComponents.run(pairs, "id_a", "id_b")
    val out = df.select(col(idCol).as("doc_id"))
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"),
        (coalesce(col("component"), col("doc_id")) === col("doc_id"))
          .cast("int").as("kept"))
      .localCheckpoint(true)
    graft.util.CheckpointHygiene.free(cc)
    out
  }

  // -- SimHash -------------------------------------------------------------

  /** 60-bit SimHash over whitespace tokens: per bit, net +1/-1 vote from
    * each token-hash's bit, sign -> output bit. Pure Column expressions:
    * the per-token bit votes are materialized once as an array, then
    * summed with a single `aggregate` over a 60-slot counter vector
    * (one pass over the token array). */
  def simhash(c: Column): Column = {
    val toks = filter(split(c, "\\s+"), t => t =!= "")
    val hashes = transform(toks, t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    // per-token vote vector (literal shifts so codegen stays simple)
    val voteVecs = transform(hashes, h =>
      array(Seq.tabulate(60)(b =>
        when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)): _*))
    val votes = aggregate(
      voteVecs,
      array(Seq.fill(60)(lit(0)): _*),
      (acc, v) => zip_with(acc, v, (a, x) => a + x))
    Seq.tabulate(60)(b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  // -- embedding-cosine near-dup -------------------------------------------

  /** Embedding-cosine near-duplicate pairs: bucket the corpus by
    * random-hyperplane sign bits (one bucket per vector, so buckets are
    * disjoint and the self-join emits no duplicate pairs), pair within
    * bucket, keep cosine >= threshold. Scale path: the shuffle key is the
    * bucket id, so cost is sum over buckets of |bucket|² rather than n²;
    * raise `bits` to shrink buckets (recall trades off exactly as in
    * [[graft.ann.SimilaritySearch.lshTopK]]).
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 4, threshold: Double = 0.4, dims: Int = -1): DataFrame = {
    import graft.ann.SimilaritySearch.{cosineWithNorms, lshBucket, lshBucketStatic, norm}
    // per-ROW invariants (bucket, L2 norm) before the self-join; the
    // per-PAIR cost is one codegen'd dot product (see SimilaritySearch)
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"))
      .withColumn("bucket",
        if (dims > 0) lshBucketStatic(col("e"), bits, dims)
        else lshBucket(col("e"), bits))
      .withColumn("nrm", norm(col("e")))
    v.as("a").join(v.as("b"), Seq("bucket"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", round(
        cosineWithNorms(col("a.e"), col("b.e"), col("a.nrm"), col("b.nrm")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with EXACT recall for the claimed radius:
    * the 60-bit signature is split into `maxHamming + 1` contiguous
    * blocks, so by pigeonhole any pair within hamming distance
    * <= maxHamming has all its differing bits inside at most maxHamming
    * blocks and therefore shares at least one block verbatim — the
    * block value is the bucket key (Manku et al., WWW'07 §3, the
    * single-table special case). Recall is 100%, precision is restored
    * by the explicit hamming filter after the bucket join.
    *
    * Scale tradeoff (the honest one): more blocks = fewer bits per
    * block (60/(k+1)) = hotter buckets — the per-bucket cost is
    * Σ|bucket|², so the radius the single-table scheme supports shrinks
    * as the corpus grows. At web scale, larger radii use Manku's
    * multi-table variant (permute the signature, re-block, union the
    * candidate sets), which trades T× storage/shuffle for T more
    * tables; maxHamming <= 6 (7 blocks of 8-9 bits) is the practical
    * single-table ceiling and the shipped default. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val numBlocks = maxHamming + 1
    require(numBlocks <= 30, s"maxHamming=$maxHamming leaves <2 bits per block")
    // block b covers bits [off(b), off(b)+width(b)): first (60 % numBlocks)
    // blocks get the extra bit
    val base = 60 / numBlocks
    val rem = 60 % numBlocks
    val widths = Seq.tabulate(numBlocks)(b => if (b < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val withSim = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("sim", simhash(col("t")))
    val blocked = withSim.withColumn("q", explode(array(Seq.tabulate(numBlocks)(b =>
      concat(lit(s"$b|"),
        shiftright(col("sim"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).cast("string"))): _*)))
    blocked.as("a").join(blocked.as("b"), Seq("q"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Manku's MULTI-TABLE simhash blocking — the scheme [[simhashPairs]]
    * documents as the web-scale path for radii past the single-table
    * ceiling. The signature is split into `numBlocks` equal-ish blocks
    * and each "table" keys on the concatenation of one
    * `keyBlocks`-sized block COMBINATION (C(numBlocks, keyBlocks)
    * tables, all emitted by one explode — no driver loop, same
    * bucket-join shape as the single-table scheme).
    *
    * Exact recall by pigeonhole: <= maxHamming differing bits touch at
    * most maxHamming blocks, leaving >= numBlocks - maxHamming blocks
    * intact; since keyBlocks <= numBlocks - maxHamming, at least one
    * emitted combination lies entirely inside the intact blocks and
    * the pair shares that table's key verbatim. Precision is restored
    * by the explicit hamming filter after the join.
    *
    * The trade vs single-table ([[simhashPairs]] = the keyBlocks=1,
    * numBlocks=maxHamming+1 special case): key width grows from
    * 60/(k+1) to keyBlocks*60/numBlocks bits — exponentially smaller
    * buckets (Σ|bucket|² is the join cost) — paid for with
    * C(numBlocks, keyBlocks)× explode/shuffle rows. At 10^12-doc scale
    * the bucket-size term dominates, which is why the multi-table form
    * is the only one that survives radii >= 8 (Manku et al., WWW'07
    * §3: the permuted-table construction; combinations generalize the
    * same counting argument). */
  def simhashPairsMultiTable(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, numBlocks: Int = 12, keyBlocks: Int = 2): DataFrame = {
    require(keyBlocks >= 1 && keyBlocks <= numBlocks - maxHamming,
      s"exact recall needs keyBlocks <= numBlocks - maxHamming " +
        s"(got keyBlocks=$keyBlocks, numBlocks=$numBlocks, maxHamming=$maxHamming)")
    require(numBlocks <= 30, s"numBlocks=$numBlocks leaves <2 bits per block")
    val base = 60 / numBlocks
    val rem = 60 % numBlocks
    val widths = Seq.tabulate(numBlocks)(b => if (b < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(b: Int): Column =
      shiftright(col("sim"), offsets(b))
        .bitwiseAND(lit((1L << widths(b)) - 1)).cast("string")
    val combos = (0 until numBlocks).combinations(keyBlocks).toSeq
    val withSim = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("sim", simhash(col("t")))
    val blocked = withSim.withColumn("q", explode(array(combos.map(c =>
      concat_ws("_", lit(c.mkString(",")) +: c.map(blockVal): _*)): _*)))
    blocked.as("a").join(blocked.as("b"), Seq("q"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

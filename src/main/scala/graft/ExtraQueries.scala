package graft

import graft.ann.SimilaritySearch
import graft.dedup.Dedup
import graft.eda.Profiler
import graft.fixtures.AddressFixture
import graft.normalize.Normalizer
import graft.parse.PartsExtractor
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup / text-analysis / ANN / EDA / parse queries + DuckDB oracles —
  * merged into SparkEntry.queries. Kept separate only for readability.
  */
object ExtraQueries {

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  // DuckDB 60-bit md5 hash with seed prefix, over expression e
  private def h60(e: String, seedExpr: String): String =
    s"CAST(('0x' || substr(md5($seedExpr || ':' || $e), 1, 15)) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- dedup (D1, D2, D3 + scale family) ------------------------------
    "d_dedup_exact" -> ((s, dir) => Dedup.exactRows(docs(s, dir))),
    "d_dedup_norm" -> ((s, dir) =>
      Dedup.byKeyDeterministic(
        docs(s, dir).withColumn("fp", TextAnalysis.fingerprint(col("text"))),
        "fp", "doc_id").select("doc_id", "fp")),
    "d_dup_flag" -> ((s, dir) =>
      Dedup.dupFlag(docs(s, dir).select("doc_id", "lang", "source"),
        Seq("lang", "source"), "is_dup")),
    "d_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        k = 5, numHashes = 16, bands = 4, jaccardThreshold = 0.5)),
    // the full fuzzy-dedup pipeline: pairs -> CC -> keeper per cluster
    "d_minhash_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(docs(s, dir), "doc_id", "text",
        k = 5, numHashes = 16, bands = 4, jaccardThreshold = 0.5)),
    "d_simhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))),
    "d_simhash_pairs" -> ((s, dir) =>  // exact-recall pigeonhole blocking
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 6)),
    "d_simhash_pairs_mt" -> ((s, dir) =>  // multi-table variant, radius 8
      Dedup.simhashPairsMultiTable(docs(s, dir), "doc_id", "text",
        maxHamming = 8, numBlocks = 12, keyBlocks = 2)),
    "d_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        Dedup.shingles(col("text"), 5).as("sh"))
      d.as("a").join(d.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            size(array_union(col("a.sh"), col("b.sh"))).cast("double"), 6).as("jaccard"))
    }),
    "d_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(embs(s, dir), "vec_id", "embedding",
        bits = 4, threshold = 0.4, dims = 64)),
    // -- ANN over embeddings ---------------------------------------------
    "v_ann_brute" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilaritySearch.bruteTopK(e, e.filter(col("vec_id") % 100 === 0), k = 5)
    }),
    "v_ann_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilaritySearch.lshTopK(e, e.filter(col("vec_id") % 100 === 0),
        k = 5, bits = 4, dims = 64)
    }),
    "v_ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilaritySearch.ivfTopK(e, e.filter(col("vec_id") % 100 === 0),
        centroids = e.filter(col("vec_id") % 50 === 0), k = 5, nProbe = 2)
    }),
    // -- text analysis ----------------------------------------------------
    "x_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),
    "x_quality" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      TextAnalysis.qualityColumns(col("text")).foldLeft(base) {
        case (df, (n, c)) => df.withColumn(n, c)
      }.drop("text")
    }),
    "x_token_counts" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      TextAnalysis.tokenCounts(col("text")).foldLeft(base) {
        case (df, (n, c)) => df.withColumn(n, c)
      }.drop("text")
    }),
    "x_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),
    // -- EDA (A1-A7) -------------------------------------------------------
    "g_value_counts" -> ((s, dir) => Profiler.valueCounts(docs(s, dir), "lang")),
    "g_missing" -> ((s, dir) =>
      Profiler.missingProfile(graft.transcripts.Transcripts.turns(s, dir).toDF())),
    "g_len_stats" -> ((s, dir) => Profiler.lengthStats(docs(s, dir), "text")),
    "g_histogram" -> ((s, dir) =>
      Profiler.histogram(docs(s, dir), col("n_chars"), 50)),
    "g_gini" -> ((s, dir) => Profiler.giniDiversity(docs(s, dir), "lang")),
    "g_quantiles" -> ((s, dir) =>
      Profiler.quantiles(docs(s, dir), length(col("text")),
        Seq(0.25, 0.5, 0.75, 0.95))),
    "g_token_freq" -> ((s, dir) => Profiler.tokenFrequency(docs(s, dir), "text", 20)),
    "g_bigrams" -> ((s, dir) => Profiler.bigramFrequency(docs(s, dir), "text", 20)),
    "g_keywords" -> ((s, dir) =>
      Profiler.keywordPresence(docs(s, dir), "text", Seq("spark", "merge", "window"))),
    // -- ML linkage baseline (J19): relational char-ngram TF-IDF 1-NN ----
    "ml_tfidf_knn" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ml.TfIdf.cosineTopK(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 3, k = 1, minDf = 3L, maxDfRatio = 0.9)
    }),
    // -- classifier path (reference Adım 3: CV metrics + submission) ------
    "ml_classifier_metrics" -> ((s, dir) =>
      graft.ml.NaiveBayesText.cvMetrics(docs(s, dir), "doc_id", "text", "lang",
        folds = 3, minDf = 3L)),
    "ml_nb_submission" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ml.NaiveBayesText.predict(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "lang", minDf = 3L)
    }),
    // -- parse battery -----------------------------------------------------
    "p_parts_num" -> ((s, dir) =>
      AddressFixture.rightAll(s, dir)
        .withColumn("t", Normalizer.normalizeAddress(col("address")))
        .select(col("id"),
          regexp_extract(col("t"), "\\bno ([0-9]+)", 1).as("no"),
          regexp_extract(col("t"), "\\bdaire ([0-9]+)", 1).as("daire"),
          regexp_extract(col("t"), "\\bkat ([0-9]+)", 1).as("kat"))),
    // NOTE: the exact-parity UDF chain (cleanText -> parse_parts ->
    // postprocess) is GOLDEN-GATED (ParseParitySpec, 85/85 vectors from
    // executing the reference itself) rather than driver-oracled: its
    // Java-lookaround regexes cannot be mirrored in DuckDB's RE2. Its
    // RE2-expressible battery IS hash-checked: p_parts_struct (all 10
    // extract fields + confidence) and p_parts_tail (the postprocess
    // tail il/ilçe rules) below.
    // X4/X5 tail il/ilçe parse under a driver hash check: both rules
    // (slash pair, adjacent pair) over a slash-preserving lowercase
    // normalize — side 1 exercises "district/city", side 0 "district
    // city".
    "p_parts_tail" -> ((s, dir) =>
      AddressFixture.left(s, dir).select(col("id"), col("address"))
        .unionAll(AddressFixture.rightAll(s, dir).select(col("id"), col("address")))
        .withColumn("t", trim(regexp_replace(lower(col("address")), "\\s+", " ")))
        .select(col("id"), PartsExtractor.tailIlIlceExpr(col("t")).as("p"))
        .select(col("id"), col("p.*"))),
    // X7 weak BIO labeling over the gazetteer hint sets (the address
    // fixture's mahalle pool as the index; city/district hints as
    // il/ilçe keys).
    "p_weak_bio" -> ((s, dir) =>
      AddressFixture.rightAll(s, dir)
        .withColumn("t", Normalizer.normalizeAddress(col("address")))
        .select(col("id"),
          array_join(graft.parse.WeakLabeling.tokens(col("t")), " ").as("tokens"),
          array_join(graft.parse.WeakLabeling.weakBioLabels(col("t"),
            AddressFixture.mahalles,
            AddressFixture.cities.map(_._1),
            AddressFixture.cities.map(_._2)), " ").as("labels"))),
    // The FULL X2 battery (all 10 fields + confidence arithmetic) under
    // a driver hash check: extractExpr over the RE2-portable address
    // normalize — every regex/branch is mirrored in DuckDB below.
    // (p_parts_full stays golden-verified: cleanText + the postprocess
    // pass use Java-regex lookarounds that RE2 cannot express.)
    "p_parts_struct" -> ((s, dir) =>
      AddressFixture.rightAll(s, dir)
        .withColumn("t", Normalizer.normalizeAddress(col("address")))
        .select(col("id"), PartsExtractor.extractExpr(col("t")).as("p"))
        .select(col("id"), col("p.*")))
  )

  // -- DuckDB mirror of the NB classifier (NaiveBayesText) ----------------

  /** Two-channel (char-3 + word) term counts over documents. */
  private val nbTermsCte: String = """
    |nb_terms AS (
    |  SELECT doc_id AS id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
    |    SELECT doc_id, unnest(list_concat(
    |      list_transform(generate_series(1, greatest(length(text)-2, 0)),
    |        i -> 'c:' || substring(text, CAST(i AS INT), 3)),
    |      list_transform(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
    |        t -> 'w:' || t))) AS term
    |    FROM documents)
    |  GROUP BY doc_id, term
    |)""".stripMargin

  /** Train→score CTE block: vocab (min_df=3) from `tr`, NB scores of
    * `tv` docs. Emits CTEs suffixed `_$k` expecting tr_$k/va-like id
    * frames already defined. */
  private def nbScoreCtes(k: String, trainCte: String, testIdsCte: String): String = s"""
    |vocab_$k AS (
    |  SELECT term FROM nb_terms JOIN $trainCte USING (id)
    |  GROUP BY term HAVING count(DISTINCT id) >= 3
    |),
    |wl_$k AS (
    |  SELECT t.id, t.term, t.tf, tr.label
    |  FROM nb_terms t JOIN vocab_$k USING (term) JOIN $trainCte tr ON t.id = tr.id
    |),
    |tc_$k AS (SELECT label, term, sum(tf) AS cnt_tc FROM wl_$k GROUP BY label, term),
    |ct_$k AS (SELECT label, sum(tf) AS cnt_c FROM wl_$k GROUP BY label),
    |nd_$k AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM $trainCte),
    |vs_$k AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab_$k),
    |pri_$k AS (SELECT label, ln(CAST(count(*) AS DOUBLE) / n_docs) AS prior
    |           FROM $trainCte, nd_$k GROUP BY label, n_docs),
    |cls_$k AS (SELECT ct.label, ct.cnt_c, pri.prior
    |           FROM ct_$k ct JOIN pri_$k pri USING (label)),
    |tv_$k AS (
    |  SELECT t.id, t.term, t.tf
    |  FROM nb_terms t JOIN vocab_$k USING (term) JOIN $testIdsCte v ON t.id = v.id
    |),
    |sc_$k AS (
    |  SELECT tv.id, c.label,
    |         round(c.prior + sum(tv.tf *
    |           ln((coalesce(tc.cnt_tc, 0.0::DOUBLE) + 1.0::DOUBLE) / (c.cnt_c + vs.v))), 6) AS score
    |  FROM tv_$k tv CROSS JOIN cls_$k c
    |  LEFT JOIN tc_$k tc ON tc.label = c.label AND tc.term = tv.term
    |  CROSS JOIN vs_$k vs
    |  GROUP BY tv.id, c.label, c.prior
    |),
    |ranked_$k AS (
    |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, label ASC) AS rnk
    |  FROM sc_$k
    |)""".stripMargin

  /** Per-fold metric CTEs: accuracy, macro-F1 (over the global label
    * set, 0/0→0), top-3 accuracy. */
  private def nbFoldMetricCtes(k: Int): String = s"""
    |tr_$k AS (SELECT id, label FROM nb_folds WHERE fold <> $k),
    |va_$k AS (SELECT id, label FROM nb_folds WHERE fold = $k),
    |${nbScoreCtes(k.toString, s"tr_$k", s"va_$k").stripPrefix("\n")},
    |top1_$k AS (SELECT id, label AS pred FROM ranked_$k WHERE rnk = 1),
    |j_$k AS (SELECT va.id, va.label AS truth, top1.pred
    |         FROM va_$k va LEFT JOIN top1_$k top1 USING (id)),
    |base_$k AS (SELECT count(*) AS n,
    |                   CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT) AS correct
    |            FROM j_$k),
    |hits3_$k AS (SELECT count(*) AS hits3 FROM ranked_$k r JOIN va_$k va
    |             ON r.id = va.id AND r.label = va.label WHERE r.rnk <= 3),
    |bytruth_$k AS (SELECT truth AS c, count(*) AS n_true,
    |                      CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT) AS tp
    |               FROM j_$k GROUP BY truth),
    |bypred_$k AS (SELECT pred AS c, count(*) AS n_pred FROM j_$k
    |              WHERE pred IS NOT NULL GROUP BY pred),
    |perclass_$k AS (
    |  SELECT coalesce(bt.tp, 0) AS tp,
    |         coalesce(bp.n_pred, 0) - coalesce(bt.tp, 0) AS fp,
    |         coalesce(bt.n_true, 0) - coalesce(bt.tp, 0) AS fn
    |  FROM nb_all_labels al
    |  LEFT JOIN bytruth_$k bt ON al.c = bt.c
    |  LEFT JOIN bypred_$k bp ON al.c = bp.c
    |),
    |macro_$k AS (
    |  SELECT avg(CASE WHEN 2.0::DOUBLE * tp + fp + fn = 0.0::DOUBLE THEN 0.0::DOUBLE
    |                  ELSE 2.0::DOUBLE * tp / (2.0::DOUBLE * tp + fp + fn) END) AS macro_f1
    |  FROM perclass_$k
    |),
    |row_$k AS (
    |  SELECT $k AS fold,
    |         round(CAST(correct AS DOUBLE) / n, 6) AS accuracy,
    |         round(macro_f1, 6) AS macro_f1,
    |         round(CAST(hits3 AS DOUBLE) / n, 6) AS top3_acc
    |  FROM base_$k, macro_$k, hits3_$k
    |)""".stripMargin

  private def nbClassifierMetricsSql: String = s"""
    |WITH ${nbTermsCte.stripPrefix("\n").stripPrefix("|")},
    |nb_folds AS (
    |  SELECT doc_id AS id, lang AS label,
    |         CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 3 AS INT) AS fold
    |  FROM documents
    |),
    |nb_all_labels AS (SELECT DISTINCT lang AS c FROM documents),
    |${(0 until 3).map(k => nbFoldMetricCtes(k).stripPrefix("\n").stripPrefix("|")).mkString(",\n")}
    |SELECT * FROM row_0 UNION ALL SELECT * FROM row_1 UNION ALL SELECT * FROM row_2
    |""".stripMargin

  private def nbSubmissionSql: String = s"""
    |WITH ${nbTermsCte.stripPrefix("\n").stripPrefix("|")},
    |tr_s AS (SELECT doc_id AS id, lang AS label FROM documents WHERE doc_id % 2 = 0),
    |va_s AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 = 1),
    |${nbScoreCtes("s", "tr_s", "va_s").stripPrefix("\n").stripPrefix("|")}
    |SELECT id, label AS label_pred FROM ranked_s WHERE rnk = 1
    |""".stripMargin

  private def docsLangScoreDuck(ws: Seq[String]): String =
    s"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '' AND t IN (${ws.map(w => s"'$w'").mkString(",")})))"

  /** The d_minhash_pairs oracle statement, shared with the
    * d_minhash_clusters oracle (which embeds it as a CTE). The
    * shingle→signature→band chain comes from
    * [[Dedup.minhashBandsSqlDuck]] (single home for the mirror
    * arithmetic, shared with the m_match_lsh/m_match_comp oracles);
    * `keepShingles` carries the shingle sets through for the exact
    * Jaccard verify. */
  private def minhashPairsSqlDuck: String = {
    val bandsCte = Dedup.minhashBandsSqlDuck(
      "documents", "doc_id", "text", Nil,
      k = 5, numHashes = 16, bands = 4, keepShingles = true)
    s"""
      |WITH $bandsCte
      |, cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      |  FROM mb_bands a JOIN mb_bands b ON a.band = b.band AND a.doc_id < b.doc_id
      |)
      |SELECT id_a, id_b,
      |       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
      |             CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE), 6) AS jaccard
      |FROM cand
      |WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE) >= 0.5
      |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "d_dedup_exact" -> "SELECT DISTINCT * FROM documents",
    "d_dedup_norm" -> s"""
      |WITH f AS (SELECT doc_id, ${TextAnalysis.fingerprintSqlDuck("text")} AS fp FROM documents)
      |SELECT min(doc_id) AS doc_id, fp FROM f GROUP BY fp
      |""".stripMargin,
    "d_dup_flag" -> """
      |SELECT doc_id, lang, source,
      |       CAST(count(*) OVER (PARTITION BY lang, source) > 1 AS INT) AS is_dup
      |FROM documents
      |""".stripMargin,
    // MinHash mirror of Dedup.mhMix (shared body above): per-seed
    // 60-bit xor constant, then the premasked xorshift steps.
    "d_minhash_pairs" -> minhashPairsSqlDuck,
    // clusters = recursive closure over the SAME pair SQL + left join
    // back to all docs (singletons are their own cluster, kept=1)
    "d_minhash_clusters" -> s"""
      |WITH mp AS ($minhashPairsSqlDuck),
      |edges AS (SELECT id_a AS u, id_b AS v FROM mp
      |          UNION SELECT id_b, id_a FROM mp),
      |comp AS (
      |  SELECT id, min(r) AS component FROM (
      |    WITH RECURSIVE reach(id, r) AS (
      |      SELECT u, u FROM edges
      |      UNION
      |      SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
      |    ) SELECT id, r FROM reach
      |  ) GROUP BY id
      |)
      |SELECT d.doc_id,
      |       COALESCE(c.component, d.doc_id) AS cluster_id,
      |       CAST(COALESCE(c.component, d.doc_id) = d.doc_id AS INT) AS kept
      |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
      |""".stripMargin,
    "d_simhash" -> s"""
      |WITH h AS (
      |  SELECT doc_id,
      |         list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
      |           t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(list_sum(list_transform(generate_series(0, 59), b ->
      |    CASE WHEN len(list_filter(hs, x -> (x >> CAST(b AS INT)) & 1 = 1)) * 2 - len(hs) > 0
      |         THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS BIGINT) AS sim
      |FROM h
      |""".stripMargin,
    // brute-force oracle: blocked Spark result must equal ALL pairs
    // within the hamming radius (recall is exact by pigeonhole)
    "d_simhash_pairs" -> s"""
      |WITH h AS (
      |  SELECT doc_id,
      |         list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
      |           t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
      |  FROM documents
      |), sims AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
      |      CASE WHEN len(list_filter(hs, x -> (x >> CAST(b AS INT)) & 1 = 1)) * 2 - len(hs) > 0
      |           THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS BIGINT) AS sim
      |  FROM h
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
      |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sim, b.sim)) <= 6
      |""".stripMargin,
    // brute-force oracle again: the multi-table blocking must return ALL
    // pairs within hamming radius 8 (recall is exact by pigeonhole over
    // block combinations)
    "d_simhash_pairs_mt" -> s"""
      |WITH h AS (
      |  SELECT doc_id,
      |         list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
      |           t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
      |  FROM documents
      |), sims AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
      |      CASE WHEN len(list_filter(hs, x -> (x >> CAST(b AS INT)) & 1 = 1)) * 2 - len(hs) > 0
      |           THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS BIGINT) AS sim
      |  FROM h
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
      |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sim, b.sim)) <= 8
      |""".stripMargin,
    "d_ngram_jaccard" -> """
      |WITH sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 0)),
      |                       i -> substring(text, CAST(i AS INT), 5))) AS sh
      |  FROM documents
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |             CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
      |""".stripMargin,
    "d_embed_neardup" -> {
      def plane(p: String, i: String) =
        s"(CAST(('0x' || substr(md5('plane' || $p || ':' || CAST($i AS STRING)), 1, 8)) AS BIGINT)::DOUBLE / 2147483648.0 - 1.0)"
      s"""
      |WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |b AS (
      |  SELECT vec_id, e,
      |    CAST(list_sum(list_transform(generate_series(0, 3), p ->
      |      CASE WHEN list_sum(list_transform(generate_series(0, len(e)-1), i ->
      |                  e[CAST(i AS INT)+1] * ${plane("CAST(p AS STRING)", "i")})) >= 0
      |           THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM v
      |)
      |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
      |       round(list_dot_product(x.e, y.e) /
      |             (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) AS cos
      |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      |WHERE list_dot_product(x.e, y.e) /
      |      (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))) >= 0.4
      |""".stripMargin
    },
    "v_ann_brute" -> """
      |WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT q.query_id, v.vec_id AS neighbor_id,
      |         round(list_dot_product(q.qe, v.e) /
      |               (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(v.e, v.e))), 6) AS cos
      |  FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= 5
      |""".stripMargin,
    "v_ann_lsh" -> {
      def plane(p: String, i: String) =
        s"(CAST(('0x' || substr(md5('plane' || $p || ':' || CAST($i AS STRING)), 1, 8)) AS BIGINT)::DOUBLE / 2147483648.0 - 1.0)"
      s"""
      |WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |b AS (
      |  SELECT vec_id, e,
      |    CAST(list_sum(list_transform(generate_series(0, 3), p ->
      |      CASE WHEN list_sum(list_transform(generate_series(0, len(e)-1), i ->
      |                  e[CAST(i AS INT)+1] * ${plane("CAST(p AS STRING)", "i")})) >= 0
      |           THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM v
      |),
      |q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT q.query_id, b.vec_id AS neighbor_id,
      |         round(list_dot_product(q.qe, b.e) /
      |               (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos
      |  FROM b JOIN q USING (bucket) WHERE b.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= 5
      |""".stripMargin
    },
    "v_ann_ivf" -> """
      |WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |cent AS (SELECT vec_id AS list_id, e AS ce FROM v WHERE vec_id % 50 = 0),
      |asg_l AS (
      |  SELECT v.vec_id, v.e, c.list_id,
      |         row_number() OVER (PARTITION BY v.vec_id
      |           ORDER BY round(list_dot_product(v.e, c.ce) /
      |                    (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
      |                    c.list_id DESC) AS crank
      |  FROM v CROSS JOIN cent c
      |),
      |asg_p AS (
      |  SELECT v.vec_id, v.e, c.list_id,
      |         row_number() OVER (PARTITION BY v.vec_id
      |           ORDER BY round(list_dot_product(v.e, c.ce) /
      |                    (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
      |                    c.list_id ASC) AS crank
      |  FROM v CROSS JOIN cent c WHERE v.vec_id % 100 = 0
      |),
      |lists AS (SELECT vec_id AS neighbor_id, e AS nv, list_id FROM asg_l WHERE crank = 1),
      |probes AS (SELECT vec_id AS query_id, e AS qv, list_id FROM asg_p
      |           WHERE crank <= 2),
      |scored AS (
      |  SELECT p.query_id, l.neighbor_id,
      |         round(list_dot_product(p.qv, l.nv) /
      |               (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(l.nv, l.nv))), 6) AS cos
      |  FROM lists l JOIN probes p USING (list_id)
      |  WHERE l.neighbor_id <> p.query_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= 5
      |""".stripMargin,
    "ml_tfidf_knn" -> """
      |WITH terms AS (
      |  SELECT doc_id AS id,
      |         unnest(list_transform(generate_series(1, greatest(length(text)-2, 0)),
      |                i -> substring(text, CAST(i AS INT), 3))) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT id, term, CAST(count(*) AS DOUBLE) AS tf FROM terms GROUP BY id, term
      |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents WHERE doc_id % 2 = 0),
      |idf AS (
      |  SELECT term, ln((1.0::DOUBLE + n_docs) / (1.0::DOUBLE + count(DISTINCT id))) + 1.0::DOUBLE AS idf
      |  FROM tf, n WHERE id % 2 = 0 GROUP BY term, n_docs
      |  HAVING count(DISTINCT id) >= 3
      |     AND count(DISTINCT id) <= CAST(floor(0.9 * n_docs) AS BIGINT)
      |), wtd AS (
      |  SELECT id, tf.term, tf.tf * idf.idf AS w FROM tf JOIN idf ON tf.term = idf.term
      |), nrm AS (
      |  SELECT id, sqrt(sum(w * w)) AS norm FROM wtd GROUP BY id
      |), v AS (
      |  SELECT wtd.id, term, w / norm AS weight FROM wtd JOIN nrm ON wtd.id = nrm.id
      |), scored AS (
      |  SELECT q.id AS test_id, t.id AS train_id, round(sum(q.weight * t.weight), 6) AS cos
      |  FROM v q JOIN v t ON q.term = t.term
      |  WHERE q.id % 2 = 1 AND t.id % 2 = 0
      |  GROUP BY q.id, t.id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY test_id
      |                               ORDER BY cos DESC, train_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT test_id, train_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= 1
      |""".stripMargin,
    "ml_classifier_metrics" -> nbClassifierMetricsSql,
    "ml_nb_submission" -> nbSubmissionSql,
    "x_lang_id" -> s"SELECT doc_id, lang, ${TextAnalysis.langIdSqlDuck("text")} AS lang_pred FROM documents",
    "x_quality" -> s"""
      |SELECT doc_id,
      |  length(text) AS char_len,
      |  len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS word_len,
      |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_count,
      |  length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct_count,
      |  round(CAST(${docsLangScoreDuck(TextAnalysis.langProfiles.flatMap(_._2).distinct)} AS DOUBLE) /
      |        CAST(greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')), 1) AS DOUBLE), 6) AS stop_ratio,
      |  CAST(length(text) < 10
      |    OR len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) < 2
      |    OR length(text) > 180
      |    OR length(regexp_replace(text, '[^0-9]', '', 'g')) = 0 AS INT) AS is_suspicious
      |FROM documents
      |""".stripMargin,
    "x_token_counts" -> """
      |SELECT doc_id,
      |  len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) +
      |  len(regexp_extract_all(text, '[^a-zA-Z0-9_\s]')) AS bpe_ish_tokens
      |FROM documents
      |""".stripMargin,
    "x_fingerprint" -> s"SELECT doc_id, ${TextAnalysis.fingerprintSqlDuck("text")} AS fp FROM documents",
    "g_value_counts" -> "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
    "g_missing" -> {
      val cte = graft.transcripts.Transcripts.oracleCte()
      s"""WITH $cte
         |SELECT CAST(sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_id_nulls,
         |       CAST(sum(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS turn_idx_nulls,
         |       CAST(sum(CASE WHEN role IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS role_nulls,
         |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
         |       CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tool_nulls,
         |       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_nulls
         |FROM transcripts""".stripMargin
    },
    "g_len_stats" -> """
      |SELECT count(*) AS n, min(length(text)) AS min_len, max(length(text)) AS max_len,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_len
      |FROM documents
      |""".stripMargin,
    "g_histogram" -> """
      |SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket, count(*) AS cnt
      |FROM documents GROUP BY 1
      |""".stripMargin,
    "g_gini" -> """
      |WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
      |SELECT 1.0::DOUBLE - CAST(sum(cnt*cnt) AS DOUBLE) / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS gini
      |FROM c
      |""".stripMargin,
    // quantile_cont shares percentile's rank = p·(n−1) linear
    // interpolation; both sides round to 6 dp
    // outer IS NOT NULL filter aligns the empty/all-null-input shape
    // with Spark: percentile over no values yields a null array there
    // (posexplode -> 0 rows), while DuckDB's grand aggregate still
    // emits one NULL row per branch
    "g_quantiles" -> """
      |SELECT * FROM (
      |  SELECT 0 AS i, round(quantile_cont(length(text), 0.25), 6) AS q FROM documents
      |  UNION ALL SELECT 1, round(quantile_cont(length(text), 0.50), 6) FROM documents
      |  UNION ALL SELECT 2, round(quantile_cont(length(text), 0.75), 6) FROM documents
      |  UNION ALL SELECT 3, round(quantile_cont(length(text), 0.95), 6) FROM documents
      |) WHERE q IS NOT NULL
      |""".stripMargin,
    "g_token_freq" -> """
      |SELECT token, count(*) AS cnt FROM (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS token
      |  FROM documents
      |) GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
      |""".stripMargin,
    "g_bigrams" -> """
      |SELECT bigram, count(*) AS cnt FROM (
      |  SELECT unnest(list_transform(generate_series(1, len(toks)-1),
      |           i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1])) AS bigram
      |  FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |        FROM documents)
      |) GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 20
      |""".stripMargin,
    "g_keywords" -> """
      |SELECT CAST(sum(CASE WHEN regexp_matches(text, '\bspark\b') THEN 1 ELSE 0 END) AS BIGINT) AS kw_spark,
      |       CAST(sum(CASE WHEN regexp_matches(text, '\bmerge\b') THEN 1 ELSE 0 END) AS BIGINT) AS kw_merge,
      |       CAST(sum(CASE WHEN regexp_matches(text, '\bwindow\b') THEN 1 ELSE 0 END) AS BIGINT) AS kw_window
      |FROM documents
      |""".stripMargin,
    "p_parts_num" -> {
      val norm = Normalizer.normalizeAddressSqlDuck("address")
      s"""WITH ${AddressFixture.leftCteDuck},
         |${AddressFixture.rightCteDuck},
         |n AS (SELECT id, $norm AS t FROM addr_right)
         |SELECT id,
         |  coalesce(regexp_extract(t, '\\bno ([0-9]+)', 1), '') AS no,
         |  coalesce(regexp_extract(t, '\\bdaire ([0-9]+)', 1), '') AS daire,
         |  coalesce(regexp_extract(t, '\\bkat ([0-9]+)', 1), '') AS kat
         |FROM n""".stripMargin
    },
    // X4/X5 tail il/ilçe parse — DuckDB mirror of
    // PartsExtractor.tailIlIlceExpr: same last-8-token window, same
    // right-to-left slash-pair-then-adjacent-pair precedence, the
    // 81-province list inlined as a literal.
    "p_parts_tail" -> {
      val ilList = graft.parse.PartsExtractor.ilSet.toSeq.sorted
        .map(x => s"'$x'").mkString("[", ", ", "]")
      s"""WITH ${AddressFixture.leftCteDuck},
         |${AddressFixture.rightCteDuck},
         |base AS (SELECT id, address FROM addr_left
         |         UNION ALL SELECT id, address FROM addr_right),
         |n AS (SELECT id, trim(regexp_replace(lower(address), '\\s+', ' ', 'g')) AS t FROM base),
         |tk AS (SELECT id, list_filter(string_split(t, ' '), x -> x <> '') AS toks FROM n),
         |tl AS (SELECT id, list_reverse(toks[greatest(len(toks)-7, 1):len(toks)]) AS tailr FROM tk),
         |c AS (
         |  SELECT id,
         |    list_filter(tailr, w -> regexp_matches(w, '^[a-zçğıöşü]+/[a-zçğıöşü]+$$')
         |      AND (list_contains($ilList, string_split(w, '/')[1])
         |           <> list_contains($ilList, string_split(w, '/')[2]))) AS slashes,
         |    list_filter(list_transform(generate_series(1, greatest(len(tailr)-1, 0)),
         |        j -> struct_pack(a := tailr[CAST(j+1 AS INT)], b := tailr[CAST(j AS INT)])),
         |      p -> regexp_matches(p.a, '^[a-zçğıöşü]+$$')
         |        AND regexp_matches(p.b, '^[a-zçğıöşü]+$$')
         |        AND list_contains($ilList, p.b)
         |        AND NOT list_contains($ilList, p.a)) AS pairs
         |  FROM tl
         |)
         |SELECT id,
         |  CASE WHEN len(slashes) > 0 THEN
         |         CASE WHEN list_contains($ilList, string_split(slashes[1], '/')[2])
         |              THEN string_split(slashes[1], '/')[2]
         |              ELSE string_split(slashes[1], '/')[1] END
         |       WHEN len(pairs) > 0 THEN pairs[1].b END AS il,
         |  CASE WHEN len(slashes) > 0 THEN
         |         CASE WHEN list_contains($ilList, string_split(slashes[1], '/')[2])
         |              THEN string_split(slashes[1], '/')[1]
         |              ELSE string_split(slashes[1], '/')[2] END
         |       WHEN len(pairs) > 0 THEN pairs[1].a END AS ilce
         |FROM c""".stripMargin
    },
    "p_weak_bio" -> {
      val norm = Normalizer.normalizeAddressSqlDuck("address")
      def inList(xs: Seq[String]) = xs.sorted.map(x => s"'$x'").mkString(", ")
      s"""WITH ${AddressFixture.leftCteDuck},
         |${AddressFixture.rightCteDuck},
         |n AS (SELECT id, $norm AS t FROM addr_right),
         |tk AS (SELECT id, list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS toks FROM n)
         |SELECT id, array_to_string(toks, ' ') AS tokens,
         |  array_to_string(list_transform(toks, x ->
         |    CASE WHEN x IN (${inList(AddressFixture.mahalles)}) THEN 'B-MAHALLE'
         |         WHEN x IN (${inList(AddressFixture.cities.map(_._2))}) THEN 'B-ILCE'
         |         WHEN x IN (${inList(AddressFixture.cities.map(_._1).distinct)}) THEN 'B-IL'
         |         ELSE 'O' END), ' ') AS labels
         |FROM tk""".stripMargin
    },
    // Full mirror of PartsExtractor.extractExpr. Java-regex lookaheads
    // `(?=(stop|$))` become consuming groups `(stop|$)` — identical for
    // a first-match extract (lookahead vs consume only affects where a
    // SUBSEQUENT match could start). All text is ASCII post-normalize so
    // Java (?U) word classes and RE2 ASCII classes agree.
    "p_parts_struct" -> {
      val norm = Normalizer.normalizeAddressSqlDuck("address")
      val stop = PartsExtractor.stopAlternation
      val bld = PartsExtractor.buildingAlternation
      def following(anchor: String) =
        s"nullif(trim(regexp_replace(regexp_extract(t, '$anchor\\s+([a-zğüşiöç0-9 \\-]+?)\\s+($stop|$$)', 1), '\\s+', ' ', 'g')), '')"
      def hintHits(hints: Set[String]) = {
        val in = hints.toSeq.sorted.map(h => s"'$h'").mkString(", ")
        s"""flatten(list_transform(list_reverse(string_split(t, '/')), p ->
           |      list_filter(string_split(trim(regexp_replace(p, '\\s+', ' ', 'g')), ' '),
           |        x -> x IN ($in))))""".stripMargin
      }
      val noSplitOk =
        """no0 IS NOT NULL AND len(string_split(no0, '/')) = 2
          |          AND regexp_matches(string_split(no0, '/')[1], '^[0-9]+$')
          |          AND regexp_matches(string_split(no0, '/')[2], '^[0-9]+$')""".stripMargin
      def notNull1(c: String) = s"(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END)"
      s"""WITH ${AddressFixture.leftCteDuck},
         |${AddressFixture.rightCteDuck},
         |n AS (SELECT id, $norm AS t FROM addr_right),
         |f AS (
         |  SELECT id, t,
         |    nullif(regexp_extract(t, '\\bno\\s*([0-9]+[a-z]?(?:/[0-9a-z]+)?)\\b', 1), '') AS no0,
         |    nullif(regexp_extract(t, '\\bdaire\\s*([0-9a-z]+)\\b', 1), '') AS daire_raw,
         |    nullif(regexp_extract(t, '\\bkat\\s*([0-9a-z]+)\\b', 1), '') AS kat_raw,
         |    ${following("mahalle")} AS mahalle,
         |    ${following("cadde")} AS cadde,
         |    nullif(regexp_extract(t, '\\b([0-9]+)\\s+sokak\\b', 1), '') AS numsok,
         |    ${following("sokak")} AS sokak_f,
         |    nullif(regexp_extract(t, '\\b([a-zğüşiöç\\-]+)\\s+mevkii\\b', 1), '') AS mevkii,
         |    nullif(trim(regexp_replace(regexp_extract(t,
         |      '(?:([a-zğüşiöç\\-]+)\\s+)?(?:([a-zğüşiöç\\-]+)\\s+)?\\b($bld)\\b'),
         |      '^(\\bno\\b\\s*[0-9]+[a-z]?/?[0-9]*\\s*|[0-9]+[a-z]?\\s*)', '')), '') AS bina_adi,
         |    ${hintHits(PartsExtractor.cityHints)} AS il_hits,
         |    ${hintHits(PartsExtractor.districtHints)} AS ilce_hits
         |  FROM n
         |), g AS (
         |  SELECT id, mahalle, cadde,
         |    coalesce(numsok, sokak_f) AS sokak,
         |    CASE WHEN $noSplitOk THEN string_split(no0, '/')[1] ELSE no0 END AS no,
         |    coalesce(
         |      CASE WHEN $noSplitOk THEN string_split(no0, '/')[2] END,
         |      CASE WHEN regexp_matches(daire_raw, '^[0-9]+[a-z]?$$') THEN daire_raw END) AS daire,
         |    CASE WHEN regexp_matches(kat_raw, '^[0-9]+[a-z]?$$') THEN kat_raw END AS kat,
         |    bina_adi, mevkii,
         |    CASE WHEN len(il_hits) > 0 THEN il_hits[1] END AS il,
         |    CASE WHEN len(ilce_hits) > 0 THEN ilce_hits[1] END AS ilce
         |  FROM f
         |)
         |SELECT id, mahalle, cadde, sokak, no, daire, kat, bina_adi, mevkii, il, ilce,
         |  round(least(greatest(
         |    0.2::DOUBLE * (${Seq("mahalle", "cadde", "sokak", "no", "daire", "kat",
                  "bina_adi", "mevkii", "il", "ilce").map(notNull1).mkString(" + ")})
         |    + CASE WHEN no IS NOT NULL THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END
         |    + CASE WHEN mahalle IS NOT NULL OR cadde IS NOT NULL OR sokak IS NOT NULL
         |           THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END,
         |    0.0::DOUBLE), 1.0::DOUBLE), 2) AS confidence
         |FROM g""".stripMargin
    }
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract entries for the LLM-pipeline operators (SURVEY.md §2.3).
  * Oracles are provided wherever the semantics are exactly expressible in
  * DuckDB SQL; approximate/seeded operators (MinHash, SimHash, LSH ANN) get
  * rows-only entries plus property-based ScalaTests.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_exact_dedup" -> ((s, dir) => {
      PipelineOps.exactDedup(Tables.documents(s, dir))
        .agg(
          count(lit(1)).as("kept_docs"),
          sum(col("doc_id")).as("id_checksum"),
          sum(col("dup_count")).as("total_docs"))
    }),
    "q31_dedup_by_key" -> ((s, dir) => {
      PipelineOps.dedupByKey(Tables.documents(s, dir), Seq("lang", "source"))
        .orderBy(col("lang"), col("source"))
    }),
    "q32_minhash_neardup" -> ((s, dir) => {
      // approx (seeded) — rows-only check; exactness covered by q33 + specs
      PipelineOps.minhashNearDupPairs(Tables.documents(s, dir))
        .groupBy(col("lang")).agg(count(lit(1)).as("candidate_pairs"))
        .orderBy(col("lang"))
    }),
    "q33_ngram_jaccard" -> ((s, dir) => {
      PipelineOps.jaccardNearDupPairs(Tables.documents(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("near_dup_pairs"), sum(col("id_a") + col("id_b")).as("pair_checksum"))
        .orderBy(col("lang"))
    }),
    "q34_simhash" -> ((s, dir) => {
      // Spark-hash-specific (xxhash64) — rows-only check + property specs
      PipelineOps.withSimhash(Tables.documents(s, dir))
        .groupBy(col("lang"))
        .agg(countDistinct(col("simhash")).as("distinct_simhashes"), count(lit(1)).as("docs"))
        .orderBy(col("lang"))
    }),
    "q35_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
      PipelineOps.cosineTopK(emb, probes, k = 5)
        .select(col("probe_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    }),
    "q36_lsh_ann" -> ((s, dir) => {
      // bucketed ANN (seeded) — rows-only; recall vs exact covered in specs
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
      PipelineOps.lshAnnPairs(emb, probes, minCosine = 0.3)
        .groupBy(col("probe_id")).agg(count(lit(1)).as("candidates"))
        .orderBy(col("probe_id"))
    }),
    "q37_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), PipelineOps.langIdScore(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),
    "q38_quality_score" -> ((s, dir) => {
      PipelineOps.withQualityScore(Tables.documents(s, dir))
        .groupBy(col("source"))
        .agg(
          round(avg(col("quality_score")), 3).as("avg_quality"),
          round(avg(col("stopword_ratio")), 3).as("avg_stopword_ratio"),
          sum(col("punct_count").cast("long")).as("punct_total"))
        .orderBy(col("source"))
    }),
    "q39_token_count" -> ((s, dir) => {
      PipelineOps.withTokenCounts(Tables.documents(s, dir))
        .groupBy(col("lang"))
        .agg(
          sum(col("ws_tokens").cast("long")).as("ws_total"),
          sum(col("bpe_tokens").cast("long")).as("bpe_total"),
          count(lit(1)).as("docs"))
        .orderBy(col("lang"))
    }),
    "q40_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), PipelineOps.fingerprint(col("text")).as("fp"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("fp")).as("distinct_fps"), min(col("fp")).as("min_fp"))
        .orderBy(col("lang"))
    }),
    "q43_ivf_ann" -> ((s, dir) => {
      // k-means quantizer (seeded) — rows-only; recall vs exact in specs
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
      PipelineOps.ivfAnnTopK(emb, probes, k = 5)
        .groupBy(col("probe_id")).agg(count(lit(1)).as("results"))
        .orderBy(col("probe_id"))
    }),
    "q49_winnowing" -> ((s, dir) => {
      // xxhash64-based selection — rows-only check + property specs
      PipelineOps.withWinnowingFingerprints(Tables.documents(s, dir))
        .groupBy(col("lang"))
        .agg(
          sum(size(col("fps")).cast("long")).as("total_fps"),
          countDistinct(col("doc_id")).as("docs"))
        .orderBy(col("lang"))
    }),
    "q41_multimodal_features" -> ((s, dir) => {
      // binary payload + struct metadata + batch feature extraction
      // (decode stubbed — rows-only check; plumbing covered by specs)
      val media = Multimodal.packAsMedia(Tables.documents(s, dir))
      Multimodal.extractFeatures(media)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_media"),
          round(avg(element_at(col("features"), 1)), 4).as("avg_bin0"))
        .orderBy(col("source"))
    }))

  def oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT count(*) AS kept_docs, CAST(sum(m_id) AS BIGINT) AS id_checksum,
        |       CAST(sum(c) AS BIGINT) AS total_docs
        |FROM (SELECT min(doc_id) AS m_id, count(*) AS c
        |      FROM documents GROUP BY sha256(text))""".stripMargin,
    "q31_dedup_by_key" ->
      """SELECT lang, source, min(doc_id) AS first_doc_id
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q33_ngram_jaccard" ->
      """WITH prepped AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars / 30) AS BIGINT) AS bucket,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' '))),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS shingles
        |  FROM documents)
        |SELECT a.lang AS lang, count(*) AS near_dup_pairs,
        |       CAST(sum(a.doc_id + b.doc_id) AS BIGINT) AS pair_checksum
        |FROM prepped a JOIN prepped b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.bucket - b.bucket) <= 1
        |WHERE 2 * len(list_intersect(a.shingles, b.shingles))
        |      >= len(list_distinct(list_concat(a.shingles, b.shingles)))
        |GROUP BY a.lang ORDER BY lang""".stripMargin,
    "q35_cosine_topk" ->
      """WITH probes AS (SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT probe_id, e.vec_id AS neighbor_id,
        |         list_cosine_similarity(p, e.embedding) AS cos_sim
        |  FROM probes CROSS JOIN embeddings e
        |  WHERE e.vec_id <> probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q37_lang_id" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_intersect(string_split(text,' '), ['the','a','of'])) AS s_en,
        |    len(list_intersect(string_split(text,' '), ['der','die','und'])) AS s_de,
        |    len(list_intersect(string_split(text,' '), ['le','la','et'])) AS s_fr,
        |    len(list_intersect(string_split(text,' '), ['el','los','y'])) AS s_es,
        |    len(list_intersect(string_split(text,' '), ['的','是','了'])) AS s_zh
        |  FROM documents),
        |pred AS (
        |  SELECT lang,
        |    CASE
        |      WHEN s_en = greatest(s_en,s_de,s_fr,s_es,s_zh) AND s_en > 0 THEN 'en'
        |      WHEN s_de = greatest(s_en,s_de,s_fr,s_es,s_zh) AND s_de > 0 THEN 'de'
        |      WHEN s_fr = greatest(s_en,s_de,s_fr,s_es,s_zh) AND s_fr > 0 THEN 'fr'
        |      WHEN s_es = greatest(s_en,s_de,s_fr,s_es,s_zh) AND s_es > 0 THEN 'es'
        |      WHEN s_zh = greatest(s_en,s_de,s_fr,s_es,s_zh) AND s_zh > 0 THEN 'zh'
        |      ELSE 'und' END AS predicted
        |  FROM scored)
        |SELECT lang, predicted, count(*) AS n FROM pred
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "q38_quality_score" ->
      """WITH q AS (
        |  SELECT source,
        |    len(string_split(text,' ')) AS n_tokens,
        |    CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
        |      / len(string_split(text,' ')) AS mean_token_len,
        |    CAST(len(list_intersect(list_distinct(string_split(text,' ')),
        |         ['the','a','of','der','die','und','le','la','et','el','los','y','的','是','了'])) AS DOUBLE)
        |      / len(list_distinct(string_split(text,' '))) AS stopword_ratio,
        |    CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE) AS punct_count
        |  FROM documents)
        |SELECT source,
        |  round(avg(least(CAST(n_tokens AS DOUBLE)/40.0, 1.0) * 0.5
        |        + (1.0 - stopword_ratio) * 0.3
        |        + least(mean_token_len/8.0, 1.0) * 0.2), 3) AS avg_quality,
        |  round(avg(stopword_ratio), 3) AS avg_stopword_ratio,
        |  CAST(sum(CAST(punct_count AS BIGINT)) AS BIGINT) AS punct_total
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q39_token_count" ->
      """SELECT lang,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS ws_total,
        |  CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS bpe_total,
        |  count(*) AS docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q40_fingerprint" ->
      """WITH fp AS (
        |  SELECT lang,
        |         md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp
        |  FROM documents)
        |SELECT lang, count(DISTINCT fp) AS distinct_fps, min(fp) AS min_fp
        |FROM fp GROUP BY lang ORDER BY lang""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ops.{AsOf, Dedup, Multimodal, Similarity, Skew, TextStats}

/** Training-data-pipeline extension queries over `documents`/`embeddings`
  * (SURVEY §7.2 step 7): dedup, similarity search, text analysis. Queries
  * whose semantics aren't reasonably ANSI-SQL-expressible (MinHash/SimHash:
  * xxhash64/murmur3 have no DuckDB twin) carry no oracle and get the
  * driver's rows-only check.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // Exact dedup: distinct normalized docs per language
    Q("q_dedup_exact",
      (s, d) => documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(lower(trim(col("text")))).as("uniq_docs"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(count(DISTINCT lower(trim(text))) AS BIGINT) AS uniq_docs
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Per-language document statistics + deterministic top source
    Q("q_text_stats",
      (s, d) => {
        val docs = documents(s, d)
        val stats = docs.groupBy("lang").agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .withColumn("avg_chars",
            round(col("sum_chars").cast("double") / col("n_docs"), 2))
          .drop("sum_chars")
        val sc = docs.groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("cnt").desc, col("source"))
        val top = sc.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("lang"), col("source").as("top_source"))
        stats.join(top, "lang").orderBy("lang")
      },
      Some("""WITH s AS (
             |  SELECT lang, count(*) AS n_docs,
             |    round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars,
             |    min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |  FROM documents GROUP BY lang),
             |sc AS (SELECT lang, source, count(*) AS cnt FROM documents GROUP BY 1, 2),
             |tops AS (
             |  SELECT lang, source AS top_source,
             |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rn
             |  FROM sc)
             |SELECT s.lang, n_docs, avg_chars, min_chars, max_chars, top_source
             |FROM s JOIN tops ON s.lang = tops.lang AND rn = 1
             |ORDER BY s.lang""".stripMargin)),

    // Token counting: whitespace + BPE-ish regex tokens per language
    Q("q_token_count",
      (s, d) => TextStats.tokenStats(documents(s, d)),
      Some("""WITH t AS (
             |  SELECT lang,
             |    len(regexp_split_to_array(trim(text), '\s+')) AS ws_toks,
             |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_toks
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(ws_toks) AS BIGINT) AS sum_ws,
             |  CAST(sum(bpe_toks) AS BIGINT) AS sum_bpe,
             |  round(CAST(sum(ws_toks) AS DOUBLE) / count(*), 2) AS avg_ws
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)),

    // Quality-score decile histogram
    Q("q_quality_score",
      (s, d) => TextStats.qualityBuckets(documents(s, d)),
      Some("""WITH t AS (
             |  SELECT
             |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS wtok,
             |    CAST(length(regexp_replace(text, '[^.,!?]', '', 'g')) AS DOUBLE) AS punct
             |  FROM documents)
             |SELECT CAST(floor((0.5 * alpha
             |    + 0.3 * least(1.0, wtok / 100.0)
             |    + 0.2 * (1.0 - least(1.0, punct / 50.0))) * 10) AS BIGINT) AS bucket,
             |  count(*) AS cnt
             |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Marker-based language ID vs labeled lang
    Q("q_lang_id",
      (s, d) => TextStats.langId(documents(s, d)),
      Some("""WITH t AS (
             |  SELECT lang,
             |    CASE
             |      WHEN length(text) - length(replace(text, '的', '')) > 0 THEN 'zh'
             |      WHEN length(text) - length(replace(text, ' der ', '')) > 0 THEN 'de'
             |      WHEN length(text) - length(replace(text, ' le ', '')) > 0 THEN 'fr'
             |      WHEN length(text) - length(replace(text, ' el ', '')) > 0 THEN 'es'
             |      WHEN length(text) - length(replace(text, ' the ', '')) > 0 THEN 'en'
             |      ELSE 'unknown' END AS predicted,
             |    CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS occ_the
             |  FROM documents)
             |SELECT lang, predicted, count(*) AS cnt,
             |  CAST(sum(occ_the) AS BIGINT) AS sum_the
             |FROM t GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin)),

    // Deterministic document fingerprints
    Q("q_doc_fingerprint",
      (s, d) => documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          TextStats.fingerprint("text", col("n_chars")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  (n_chars * 1000003
             |   + (length(text) - length(replace(text, ' ', ''))) * 10007
             |   + ascii(substr(text, 1, 1)) * 101
             |   + ascii(substr(text, length(text), 1))) % 1000000007 AS fp
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // Character-3-gram Jaccard similarity for same-language doc pairs
    Q("q_ngram_jaccard",
      (s, d) => Dedup.ngramJaccard(
        documents(s, d).filter(col("doc_id") < 20), 3),
      Some("""WITH d AS (
             |  SELECT doc_id, lang, text FROM documents
             |  WHERE doc_id < 20 AND length(text) >= 3),
             |g AS (
             |  SELECT DISTINCT doc_id, lang, substr(text, CAST(i AS INT), 3) AS gram
             |  FROM (SELECT doc_id, lang, text,
             |          unnest(range(1, length(text) - 1)) AS i FROM d)),
             |sz AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
             |iv AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
             |  FROM g a JOIN g b
             |    ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT a_id, b_id,
             |  round(CAST(inter AS DOUBLE) / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard
             |FROM iv
             |JOIN sz sa ON sa.doc_id = a_id
             |JOIN sz sb ON sb.doc_id = b_id
             |ORDER BY a_id, b_id""".stripMargin)),

    // Brute-force cosine top-5 of query vector 0
    Q("q_embed_knn",
      (s, d) => Similarity.knn(embeddings(s, d), 0L, 5),
      Some("""WITH qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
             |z AS (
             |  SELECT e.vec_id, unnest(list_zip(e.embedding, qv.q_emb)) AS s
             |  FROM embeddings e, qv WHERE e.vec_id <> 0),
             |dsum AS (
             |  SELECT vec_id,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS dot,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[1] AS DOUBLE)) AS na2,
             |    sum(CAST(s[2] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS nq2
             |  FROM z GROUP BY vec_id)
             |SELECT vec_id, round(dot / (sqrt(na2) * sqrt(nq2)), 6) AS sim
             |FROM dsum ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)),

    // IVF-style ANN: top-1 neighbor per probe within its coarse partition
    Q("q_ann_ivf",
      (s, d) => Similarity.ivfTop1(embeddings(s, d), col("vec_id") < 10),
      Some("""WITH p AS (
             |  SELECT vec_id AS q_id, label, embedding AS q_emb
             |  FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS c_id, label, embedding AS c_emb FROM embeddings),
             |z AS (
             |  SELECT q_id, p.label, c_id, unnest(list_zip(c.c_emb, p.q_emb)) AS s
             |  FROM p JOIN c ON p.label = c.label AND q_id <> c_id),
             |dsum AS (
             |  SELECT q_id, label, c_id,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS dot,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[1] AS DOUBLE)) AS na2,
             |    sum(CAST(s[2] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS nq2
             |  FROM z GROUP BY 1, 2, 3),
             |r AS (
             |  SELECT q_id, label, c_id,
             |    round(dot / (sqrt(na2) * sqrt(nq2)), 6) AS sim,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY round(dot / (sqrt(na2) * sqrt(nq2)), 6) DESC, c_id) AS rn
             |  FROM dsum)
             |SELECT q_id, label, c_id, sim FROM r WHERE rn = 1 ORDER BY q_id""".stripMargin)),

    // Embedding-cosine near-duplicate pairs within coarse partitions
    Q("q_near_dup",
      (s, d) => Similarity.nearDupPairs(embeddings(s, d), 0.35),
      Some("""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
             |z AS (
             |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    unnest(list_zip(a.embedding, b.embedding)) AS s
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
             |d AS (
             |  SELECT a_id, b_id,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS dot,
             |    sum(CAST(s[1] AS DOUBLE) * CAST(s[1] AS DOUBLE)) AS na2,
             |    sum(CAST(s[2] AS DOUBLE) * CAST(s[2] AS DOUBLE)) AS nb2
             |  FROM z GROUP BY 1, 2)
             |SELECT a_id, b_id, round(dot / (sqrt(na2) * sqrt(nb2)), 6) AS sim
             |FROM d WHERE round(dot / (sqrt(na2) * sqrt(nb2)), 6) >= 0.35
             |ORDER BY a_id, b_id""".stripMargin)),

    // As-of join: attribute each purchase to the user's latest click
    // at-or-before it (clicks pre-deduped per (user, ts) so "the latest
    // click" is well-defined in both engines). DuckDB's native ASOF LEFT
    // JOIN is the oracle for our union+window formulation.
    Q("q_asof_attrib",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"), col("value").as("purchase_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), expr("ts div 1000").as("ts_us"))
          .agg(max(col("value")).as("value"))
        AsOf.asofJoin(purchases, clicks, "user_id", "ts_us", rightPrefix = "click_")
          .orderBy("event_id")
      },
      Some("""WITH l AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |         value AS purchase_value
             |  FROM events WHERE event_type = 'purchase'),
             |r AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS value
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT l.event_id, l.user_id, l.ts_us, l.purchase_value,
             |       r.ts_us AS click_ts_us, r.value AS click_value
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
             |ORDER BY l.event_id""".stripMargin)),

    // Two-phase salted aggregation over a hot key (result must be
    // bit-identical to the plain GROUP BY the oracle runs: counts are
    // additive, money sums go through DECIMAL).
    Q("q_skew_salted",
      (s, d) => Skew.saltedStats(lineitem(s, d), Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MinHash + LSH candidate pairs (xxhash64-based — no SQL twin)
    Q("q_dedup_minhash",
      (s, d) => Dedup.minhashCandidates(s, documents(s, d)),
      None),

    // Random-hyperplane LSH ANN (murmur3-hash planes — no SQL twin)
    Q("q_ann_lsh",
      (s, d) => Similarity.lshAnn(embeddings(s, d), col("vec_id") < 10),
      None),

    // SimHash Hamming-distance candidates (xxhash64-based — no SQL twin)
    Q("q_dedup_simhash",
      (s, d) => Dedup.simhashCandidates(documents(s, d).filter(col("doc_id") < 100)),
      None),

    // Multimodal plumbing: binary payload stats (bytes/frames/digest) over
    // the documents table packed as media rows
    Q("q_multimodal_stats",
      (s, d) => Multimodal.payloadStats(
          Multimodal.packText(documents(s, d).filter(col("doc_id") < 100)))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'image' AS modality,
             |  octet_length(encode(text)) AS n_bytes,
             |  CAST(floor(octet_length(encode(text)) / 256) AS BIGINT) AS n_frames,
             |  substr(md5(text), 1, 8) AS digest8
             |FROM documents WHERE doc_id < 100 ORDER BY media_id""".stripMargin)),

    // Exact-duplicate clusters by digest (md5-based — no SQL twin; DuckDB
    // has md5 but cluster membership is already covered by q_dedup_exact)
    Q("q_dedup_clusters",
      (s, d) => Dedup.exactClusters(documents(s, d)),
      Some("""WITH h AS (
             |  SELECT md5(lower(trim(text))) AS digest, doc_id FROM documents)
             |SELECT digest, count(*) AS n_dups, min(doc_id) AS keep_id
             |FROM h GROUP BY digest HAVING count(*) > 1 ORDER BY digest""".stripMargin)),
  )
}

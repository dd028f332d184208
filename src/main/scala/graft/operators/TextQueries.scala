package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.text.TextOps._

/** Text-analysis operators for the training-data pipeline (builder brief:
  * lang-ID, quality scoring, token counting, fingerprinting) over the
  * `documents` table. All pure Catalyst expressions (higher-order array
  * functions over md5-derived token hashes) — per-record projections with
  * no shuffle except the final aggregation, which is the shape that holds
  * at 100 TB.
  */
object TextQueries {

  val all: Seq[Q] = Seq(

    // Token counting per source: corpus-level token statistics.
    Q("q31_token_stats",
      (s, d) => Tables.documents(s, d)
        .selectExpr("source", "doc_id", s"explode($sparkToks) as tok")
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("total_tokens"),
          countDistinct("tok").as("distinct_tokens")),
      Some(s"""SELECT source, count(DISTINCT doc_id) AS n_docs,
              count(*) AS total_tokens, count(DISTINCT tok) AS distinct_tokens
              FROM (SELECT source, doc_id, unnest($duckToks) AS tok
                    FROM documents)
              GROUP BY source"""),
      doc = "corpus token statistics per source"),

    // Global vocabulary top-k with deterministic tiebreak.
    Q("q32_vocab_topk",
      (s, d) => Tables.documents(s, d)
        .selectExpr(s"explode($sparkToks) as tok")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(15),
      Some(s"""SELECT tok, count(*) AS n
              FROM (SELECT unnest($duckToks) AS tok FROM documents)
              GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 15"""),
      doc = "vocabulary top-k"),

    // Word tokenizer vs BPE-ish tokenizer (token-count comparison).
    Q("q33_bpe_compare",
      (s, d) => Tables.documents(s, d)
        .selectExpr("lang",
          s"size($sparkToks) as nw", s"size($sparkToksBpe) as nb")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("word_tokens"),
          sum("nb").as("bpe_tokens")),
      Some(s"""SELECT lang, count(*) AS n_docs,
              CAST(sum(len($duckToks)) AS BIGINT) AS word_tokens,
              CAST(sum(len($duckToksBpe)) AS BIGINT) AS bpe_tokens
              FROM documents GROUP BY lang"""),
      doc = "dual tokenizer token counting"),

    // Language-ID heuristic: per-doc argmax over token marker classes,
    // reported as a confusion matrix vs the labeled lang.
    Q("q34_langid",
      (s, d) => Tables.documents(s, d)
        .selectExpr("lang", s"${sparkLangPredict(sparkHps)} as predicted")
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n")),
      Some(s"""SELECT lang, ${duckLangPredict(duckHps)} AS predicted,
              count(*) AS n
              FROM documents GROUP BY 1, 2"""),
      doc = "language-ID heuristic + confusion matrix"),

    // Position-sensitive document fingerprint (rolling-hash style).
    Q("q35_fingerprint",
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", s"$sparkFingerprint as fp",
          s"size($sparkToks) as n_tok"),
      Some(s"""SELECT doc_id, $duckFingerprint AS fp,
              len($duckToks) AS n_tok
              FROM documents"""),
      doc = "per-document rolling-hash fingerprint"),

    // Data-mixture sampling: per-language stratified keep rates applied
    // with the engine's deterministic uniform (replayable, exact in both
    // engines) — the training-corpus mixing/reweighting operator.
    Q("q87_data_mixture",
      (s, d) => {
        val rate = when(col("lang") === "en", 0.9)
          .when(col("lang") === "de", 0.5)
          .when(col("lang") === "zh", 0.25)
          .otherwise(0.1)
        Tables.documents(s, d)
          .filter(graft.operators.Preprocess.detUniform(col("doc_id")) < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum("n_chars").as("sampled_chars"))
      },
      Some(s"""SELECT lang, count(*) AS n_sampled,
            CAST(sum(n_chars) AS BIGINT) AS sampled_chars
            FROM documents
            WHERE (${graft.operators.Preprocess.detUniformSql("doc_id")}) <
              CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5
                WHEN 'zh' THEN 0.25 ELSE 0.1 END
            GROUP BY lang"""),
      doc = "stratified data-mixture sampling with replayable uniforms"),

    // Quality scoring: length/stopword/token-shape heuristics → [0,1].
    Q("q36_quality",
      (s, d) => Tables.documents(s, d)
        .selectExpr("lang", s"$sparkQuality as score")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0.8, 1L).otherwise(0L)).as("n_highq"),
          min("score").as("min_score"), max("score").as("max_score")),
      Some(s"""SELECT lang, count(*) AS n_docs,
              CAST(sum(CASE WHEN score >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_highq,
              min(score) AS min_score, max(score) AS max_score
              FROM (SELECT lang, $duckQuality AS score FROM documents)
              GROUP BY lang"""),
      doc = "document quality scoring")
  )
}

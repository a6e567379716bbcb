package graft.llm

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation funnel — the composition every
  * training-data pipeline runs before tokenization:
  *
  *   quality gate ([[TextOps.textStats]] heuristics) ×
  *   language gate ×
  *   near-dup dedup decision ([[Dedup.clusters]]: MinHash-LSH pairs →
  *   CC → keep the cluster's min doc_id)
  *
  * emitted as one decision row per document with each gate's verdict
  * and the final selection — auditable (why was a doc dropped?) and
  * replayable. At 100 TB each gate is the operator documented at its
  * own query; the funnel adds two broadcast-joinable decision columns,
  * no new shuffle over document payloads.
  */
object Corpus {

  def funnel(s: SparkSession, d: String): DataFrame = {
    val quality = TextOps.textStats(s, d).select(col("doc_id"), col("is_quality"))
    val keepers = Dedup.clusters(s, d).select(col("doc_id"), col("is_keeper"), col("cluster_id"))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(quality, Seq("doc_id"))
      .join(keepers, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        col("is_quality"),
        col("lang").isin("en", "de").as("is_lang_ok"),
        col("is_keeper"),
        (col("is_quality") && col("lang").isin("en", "de") && col("is_keeper"))
          .as("selected"))
  }

  val funnelSql: String =
    s"""WITH cl AS (${Dedup.clustersSql}),
       |tq AS (
       |  SELECT doc_id,
       |    (n_tokens >= 10 AND n_tokens <= 1000 AND n_uniq_tokens * 2 >= n_tokens) AS is_quality
       |  FROM (
       |    SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |      len(list_distinct(toks))::BIGINT AS n_uniq_tokens
       |    FROM (SELECT doc_id, ${Portable.tokensSql("text")} AS toks FROM documents)))
       |SELECT d.doc_id, cl.cluster_id, tq.is_quality,
       |  d.lang IN ('en', 'de') AS is_lang_ok,
       |  cl.is_keeper,
       |  (tq.is_quality AND d.lang IN ('en', 'de') AND cl.is_keeper) AS selected
       |FROM documents d
       |JOIN tq ON d.doc_id = tq.doc_id
       |JOIN cl ON d.doc_id = cl.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_corpus_funnel", funnel, Some(funnelSql)))
}

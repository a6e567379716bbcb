package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Product, Q, Relational, VariantQueries}
import graft.flags.FlagQueries
import graft.ingest.IngestQueries
import graft.llm.{Bpe, Corpus, Dedup, KMeans, Multimodal, PQ, Select, Similarity, TextOps, Unigram, WordPiece}
import graft.state.StateQueries
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is surfaced as a named
  * query in [[queries]]; each SQL-expressible one has a DuckDB oracle in
  * [[oracleSql]] (same column names on both sides — the driver
  * hash-compares after sorting columns by name).
  */
object SparkEntry {

  /** All query registries (grows as modules land). */
  def registry: Seq[Q] =
    Relational.all ++ Product.all ++ TextOps.all ++ Bpe.all ++ Unigram.all ++ WordPiece.all ++ Dedup.all ++ Similarity.all ++ KMeans.all ++ PQ.all ++ Corpus.all ++ Select.all ++
      Multimodal.all ++ IngestQueries.all ++ StateQueries.all ++ FlagQueries.all ++
      StreamQueries.all ++ VariantQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

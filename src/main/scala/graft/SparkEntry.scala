package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{Chunker, KeywordFilterClient, LlmMap}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-domain modules under
  * graft.queries; every operator claimed in SURVEY.md §2 has an entry
  * here, and every SQL-expressible one has a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship: the reference's full dataflow (read → tokenize → chunk →
    * LLM-map filter → per-chunk results) on sf0.001 documents. Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val chunks = Chunker.chunkTable(docs, "doc_id", "text")
    LlmMap.mapChunks(chunks, KeywordFilterClient("merge"),
      "Keep the lines about merging.")
  }

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.RefPipeline.queries, graft.queries.RefPipeline.oracles),
      (graft.queries.Relational.queries, graft.queries.Relational.oracles),
      (graft.queries.Windows.queries, graft.queries.Windows.oracles),
      (graft.queries.EventsQueries.queries, graft.queries.EventsQueries.oracles),
      (graft.queries.Similarity.queries, graft.queries.Similarity.oracles),
      (graft.queries.Dedup.queries, graft.queries.Dedup.oracles),
      (graft.queries.TextAnalytics.queries, graft.queries.TextAnalytics.oracles),
      (graft.queries.Multimodal.queries, graft.queries.Multimodal.oracles),
      (graft.queries.FileFormats.queries, graft.queries.FileFormats.oracles),
      (graft.queries.Warehouse.queries, graft.queries.Warehouse.oracles),
      (graft.queries.Graph.queries, graft.queries.Graph.oracles),
      (graft.queries.Clustering.queries, graft.queries.Clustering.oracles),
      (graft.queries.Curation.queries, graft.queries.Curation.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys = non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.FileSources

/** File-format interchange round trips: write the corpus out as JSONL /
  * CSV, read it back schema-first through [[FileSources]], and verify
  * losslessness against an oracle that NEVER SEES THE FILES — it
  * aggregates the original parquet directly, so any write- or
  * read-side corruption (mis-escaped text, dropped rows, type drift,
  * quarantined lines) breaks the hash match.
  *
  * Both entries do eager file writes per evaluation (the round trip IS
  * the operator), so they are registered in `Bench.SideEffectQueries`
  * and excluded from the headline plan total, like `ref_memo_resume`.
  *
  * JSONL carries the full rows including raw text (escaped newlines);
  * the CSV entry round-trips the scalar columns only — the splittable
  * non-multiLine read is the only CSV path that scales, and it cannot
  * carry embedded newlines (object doc of [[FileSources]]).
  */
object FileFormats {

  /** Deterministic scratch dir per sf input; re-evaluations overwrite. */
  private def scratch(d: String, leaf: String): String = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_roundtrip_$key/$leaf"
  }

  /** Per-lang corpus digest with a quarantine counter: any lost or
    * altered row changes a hash; any unparseable line raises n_corrupt
    * above the oracle's pinned 0.
    */
  private def digestByLang(back: DataFrame): DataFrame =
    back.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(sha2(col("text"), 256)).as("min_hash"),
        max(sha2(col("text"), 256)).as("max_hash"),
        sum(col(FileSources.CorruptCol).isNotNull.cast("long")).as("n_corrupt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q89_jsonl_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("text"))
      val out = scratch(d, "docs_jsonl")
      FileSources.writeJsonLines(docs, out)
      digestByLang(FileSources.readJsonLines(s, out, docs.schema))
    }),

    // Range-clustered parquet write (sinks/LayoutWriter) round trip:
    // the layout properties (disjoint per-file ranges, pushed filters,
    // partition pruning) are proven in LayoutWriterSpec; this entry
    // proves the clustered rewrite is LOSSLESS against the original
    // table's digest.
    "q91_clustered_write" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_quantity"), col("l_extendedprice"))
      val out = scratch(d, "lineitem_clustered")
      graft.sinks.LayoutWriter.writeRangeClustered(li, out, numFiles = 8,
        col("l_shipdate"))
      s.read.parquet(out)
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("ship_month"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    // Small-files compaction round trip: fragment the documents table
    // into many tiny files (the streaming-append failure mode), compact
    // to ~256 KiB targets, digest the compacted copy. File-count
    // behavior is asserted in LayoutWriterSpec; this entry hash-checks
    // that compaction never alters a row.
    "q96_compacted_rewrite" -> ((s, d) => {
      val frag = scratch(d, "docs_fragmented")
      val comp = scratch(d, "docs_compacted")
      Tables.documents(s, d).repartition(32)
        .write.mode("overwrite").parquet(frag)
      graft.sinks.LayoutWriter.compact(s, frag, comp, 256L * 1024)
      s.read.parquet(comp)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(sha2(col("text"), 256)).as("min_hash"),
          max(sha2(col("text"), 256)).as("max_hash"))
    }),

    "q90_csv_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val out = scratch(d, "docs_csv")
      FileSources.writeCsv(docs, out)
      FileSources.readCsv(s, out, docs.schema)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          sum(col(FileSources.CorruptCol).isNotNull.cast("long")).as("n_corrupt"))
    })
  )

  // The oracles aggregate the ORIGINAL parquet — n_corrupt pinned to 0.
  val oracles: Map[String, String] = Map(
    "q89_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(sha256(text)) AS min_hash, max(sha256(text)) AS max_hash,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM documents GROUP BY lang""".stripMargin,

    "q91_clustered_write" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        |  count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q96_compacted_rewrite" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(sha256(text)) AS min_hash, max(sha256(text)) AS max_hash
        |FROM documents GROUP BY lang""".stripMargin,

    "q90_csv_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM documents GROUP BY source""".stripMargin
  )
}

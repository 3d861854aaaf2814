package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables._

/** Multimodal column modeling (north star; SURVEY.md §2.2): semi-
  * structured payloads as TYPED struct columns (not per-query string
  * poking), and opaque binary media columns with typed metadata.
  *
  * The deeper plumbing — batched decode-stub feature extraction over
  * binary blobs — lives in [[graft.multimodal.BinaryMedia]]; these are
  * the oracle-checkable catalog entries.
  */
object Multimodal {

  /** Declared schema for `events.props` — parsed ONCE into a struct
    * column; every field access afterwards is a typed struct access the
    * optimizer can prune, instead of q28's per-access string parse.
    */
  val PropsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON payload -> typed struct, aggregated over struct fields.
    "q44_props_struct" -> ((s, d) => {
      events(s, d)
        .withColumn("p", from_json(col("props"), PropsSchema))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("p.k")).as("k_sum"),
          round(avg(col("p.k")), 6).as("k_avg"),
          min(col("p.k")).as("k_min"),
          max(col("p.k")).as("k_max"))
    }),

    // Opaque binary media column + typed metadata: the blob is the
    // UTF-8 bytes of `text` (the fixture ships no real media; the
    // byte-level plumbing — octet length, content fingerprint, magic
    // prefix — is exactly what runs over real image/audio blobs).
    "q48_binary_meta" -> ((s, d) => {
      documents(s, d)
        .withColumn("media", col("text").cast("binary"))
        .select(
          col("doc_id"),
          octet_length(col("media")).cast("long").as("n_bytes"),
          sha2(col("media"), 256).as("fingerprint"),
          substring(hex(col("media")), 1, 8).as("magic"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_props_struct" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  round(avg(k), 6) AS k_avg,
        |  min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    // sha256/hex run on the SAME UTF-8 bytes on both sides (DuckDB's
    // sha256 has no BLOB overload, so it hashes the varchar directly).
    "q48_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS fingerprint,
        |  substring(hex(encode(text)), 1, 8) AS magic
        |FROM documents""".stripMargin
  )
}

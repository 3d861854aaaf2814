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

    // Cross-modal join: vectors to their source documents (doc_id ==
    // vec_id in the fixture). Each query doc's nearest same-bucket
    // neighbor is joined back to `documents` on BOTH ends to compare
    // text-side metadata — the embeddings-never-meet-documents gap
    // closed. Doc lookups join on the id key; vectors stay in the
    // bucketed ANN path.
    "q51_crossmodal_neighbors" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"))
      val top1 = Similarity.queries("q39_ann_buckets")(s, d)
        .filter(col("rn") === 1)
        .select(col("q_id"), col("neighbor_id"), col("cosine"))
      top1
        .join(docs.withColumnRenamed("doc_id", "q_id")
          .withColumnRenamed("lang", "q_lang"), Seq("q_id"))
        .join(docs.withColumnRenamed("doc_id", "neighbor_id")
          .withColumnRenamed("lang", "n_lang"), Seq("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"), col("cosine"),
          col("q_lang"), col("n_lang"),
          (col("q_lang") === col("n_lang")).as("same_lang"))
    }),

    // Video frame sampling over typed media metadata: one sampled frame
    // every 2 s of duration plus the stream parameters to seek it —
    // the generator + arithmetic an extract-frames stage feeds to the
    // (stubbed) decoder. Metadata is synthesized deterministically from
    // fixture columns (duration from n_chars, fps from doc_id) since
    // the corpus ships no real video; the sampling operator itself is
    // the real thing: a per-row generator, no shuffle at all.
    "q63_frame_sample" -> ((s, d) => {
      val m = documents(s, d).select(col("doc_id"),
        (col("n_chars") * 40).cast("long").as("duration_ms"),
        (lit(24) + pmod(col("doc_id"), lit(6))).cast("long").as("fps"))
      m.filter(col("duration_ms") > 0)
        .select(col("doc_id"), col("duration_ms"), col("fps"),
          explode(sequence(lit(0L),
            expr("(duration_ms - 1) div 2000"))).as("s2"))
        .select(col("doc_id"), col("duration_ms"), col("fps"),
          (col("s2") * 2000).as("ts_ms"),
          (col("s2") * 2 * col("fps")).as("frame_idx"))
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
    }),

    // Media shard packing — the WebDataset/tar-shard layout step every
    // multimodal training loader needs: opaque blobs packed into
    // ~fixed-BYTE shards in stable id order (q144's token packing, at
    // the byte granularity a media corpus is budgeted in). Shard id =
    // floor((cumulative_bytes - 1) / budget) via the chunker's
    // two-phase distributed prefix sum — only numPartitions rows ever
    // touch the driver, and a blob straddling a boundary lands wholly
    // in its cumulative-end shard, so shard_bytes < budget + max_blob
    // — both reported so packing efficiency is auditable.
    "q155_media_shards" -> ((s, d) => {
      val blobs = documents(s, d)
        .withColumn("media", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("media")).cast("long").as("n_bytes"))
      graft.pipeline.Chunker
        .runningSum(blobs, "doc_id", "n_bytes", "cum_bytes")
        .select(col("doc_id"), col("n_bytes"),
          floor((col("cum_bytes") - 1) / MediaShardBytes).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("shard_bytes"),
          min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
    })
  )

  /** q155 shard byte budget: ~32 fixture docs per shard, so every SF
    * yields a multi-shard, multi-item-per-shard layout (production
    * uses hundreds of MB; the packing arithmetic is scale-free).
    */
  val MediaShardBytes = 10000L

  val oracles: Map[String, String] = Map(
    "q44_props_struct" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  round(avg(k), 6) AS k_avg,
        |  min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q51_crossmodal_neighbors" ->
      s"""SELECT t.q_id, t.neighbor_id, t.cosine,
         |  dq.lang AS q_lang, dn.lang AS n_lang,
         |  (dq.lang = dn.lang) AS same_lang
         |FROM (${Similarity.oracles("q39_ann_buckets")}) t
         |JOIN documents dq ON dq.doc_id = t.q_id
         |JOIN documents dn ON dn.doc_id = t.neighbor_id
         |WHERE t.rn = 1""".stripMargin,

    "q63_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(n_chars * 40 AS BIGINT) AS duration_ms,
        |    CAST(24 + doc_id % 6 AS BIGINT) AS fps
        |  FROM documents)
        |SELECT doc_id, duration_ms, fps,
        |  CAST(s2 * 2000 AS BIGINT) AS ts_ms,
        |  CAST(s2 * 2 * fps AS BIGINT) AS frame_idx
        |FROM (
        |  SELECT doc_id, duration_ms, fps,
        |    unnest(range(0, (duration_ms - 1) // 2000 + 1)) AS s2
        |  FROM m WHERE duration_ms > 0)""".stripMargin,

    // sha256/hex run on the SAME UTF-8 bytes on both sides (DuckDB's
    // sha256 has no BLOB overload, so it hashes the varchar directly).
    "q48_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS fingerprint,
        |  substring(hex(encode(text)), 1, 8) AS magic
        |FROM documents""".stripMargin,

    "q155_media_shards" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_bytes,
         |    sum(n_bytes) OVER (ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM b)
         |SELECT CAST(floor((cum - 1) / $MediaShardBytes) AS BIGINT)
         |    AS shard,
         |  count(*) AS n_items,
         |  CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
         |  min(doc_id) AS first_id, max(doc_id) AS last_id
         |FROM c GROUP BY 1""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Similarity search over the `embeddings` table (north star; SURVEY.md
  * §2.2): brute-force cosine top-k as the correctness baseline, and a
  * bucketed (LSH-style) approximate variant as the 100 TB path.
  *
  * Numeric parity with the DuckDB oracle: every float element is cast to
  * double BEFORE multiplication, and sums run as sequential left folds in
  * BOTH engines (Spark `aggregate` HOF ≡ DuckDB `list_sum` over
  * `list_transform`), so the IEEE result is bit-identical; ranking
  * happens on the ROUNDED cosine with a vec_id tie-break so order can
  * never depend on sub-ulp noise.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors, as doubles —
    * the native codegen'd [[graft.expressions.VecDot]] (bit-equal to
    * the aggregate/zip_with HOF fold, minus its per-pair allocation).
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  /** Sequential-fold squared L2 norm (dot with itself). */
  def sqNorm(v: Column): Column = graft.functions.vec_dot(v, v)

  /** L2 norm. Precompute this ONCE PER ROW before any pairwise join:
    * computing norms inside the pair projection triples the
    * higher-order-function work (N*Q folds instead of N+Q).
    */
  def norm(v: Column): Column = sqrt(sqNorm(v))

  /** cosine(a, b) rounded to 6 decimals (rank on this, never the raw). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** cosine with precomputed per-row norms — identical IEEE result to
    * [[cosine]] (same folds over the same vectors), 3x less work per
    * pair.
    */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Deterministic LSH-style bit signature: bit j = sign of the sum of
    * the j-th `dimsPerBand`-wide slice of the vector. Pseudo-hyperplanes
    * are axis-group sums — fully deterministic, seed-free, and
    * expressible in ANSI SQL for the oracle (a seeded random hyperplane
    * would be strictly better-spread but not portably reproducible).
    * Computed map-side per row: at 100 TB this is a projection, not a
    * shuffle.
    */
  def bandSignature(v: Column, bands: Int, dimsPerBand: Int): Column =
    concat((0 until bands).map { j =>
      when(aggregate(slice(v, 1 + j * dimsPerBand, dimsPerBand),
        lit(0.0), (acc, x) => acc + x.cast("double")) > 0, lit("1"))
        .otherwise(lit("0"))
    }: _*)

  private val Bands = 4
  private val DimsPerBand = 16 // 64-dim vectors -> 16 buckets, ~N/16 each

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-k: every query vector (label = 0) against
    // the whole table. The query set is broadcast, so the big side never
    // shuffles — but the work is inherently O(N·Q): this is the exact
    // BASELINE; q39 is the bucketed plan you run at 100 TB.
    "q38_cosine_topk" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val q = embeddings(s, d).filter(col("label") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          norm(col("embedding")).as("q_nrm"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          cosinePre(col("q_emb"), col("embedding"),
            col("q_nrm"), col("nrm")).as("cosine"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("neighbor_id"), col("rn"), col("cosine"))
    }),

    // Bucketed ANN: signature computed map-side, candidates = same-bucket
    // rows only (~N/16 per query instead of N), exact cosine re-rank
    // inside the bucket. Never all-pairs: the join is an equi-join on the
    // signature, so at 100 TB each query touches one bucket's partition.
    // Recall is approximate by construction (a true neighbor in another
    // bucket is missed) — that is the documented ANN trade.
    "q39_ann_buckets" -> ((s, d) => {
      val sigs = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"),
          norm(col("embedding")).as("nrm"),
          bandSignature(col("embedding"), Bands, DimsPerBand).as("sig"))
      val q = sigs.filter(col("label") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("sig"))
      val cands = sigs.select(col("vec_id"), col("embedding"), col("nrm"), col("sig"))
        .join(broadcast(q), Seq("sig"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          cosinePre(col("q_emb"), col("embedding"),
            col("q_nrm"), col("nrm")).as("cosine"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("neighbor_id"), col("rn"), col("cosine"))
    }),

    // Multi-probe ANN: each query also probes every bucket at hamming
    // distance 1 from its own signature (flip one band bit) — ~(1+bands)x
    // the candidates of q39 for materially better recall, still an
    // equi-join on the signature, still never all-pairs. A candidate's
    // single signature matches at most one distinct probe per query, so
    // no pair dedup is needed.
    "q52_ann_multiprobe" -> ((s, d) => {
      val sigs = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"),
          norm(col("embedding")).as("nrm"),
          bandSignature(col("embedding"), Bands, DimsPerBand).as("sig"))
      val flips = (0 until Bands).map { i =>
        concat(
          substring(col("sig"), 1, i),
          when(substring(col("sig"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
          substring(col("sig"), i + 2, Bands - i - 1))
      }
      val q = sigs.filter(col("label") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
          explode(array(col("sig") +: flips: _*)).as("sig"))
      val cands = sigs.select(col("vec_id"), col("embedding"), col("nrm"), col("sig"))
        .join(broadcast(q), Seq("sig"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          cosinePre(col("q_emb"), col("embedding"),
            col("q_nrm"), col("nrm")).as("cosine"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("neighbor_id"), col("rn"), col("cosine"))
    })
  )

  /** DuckDB fragment: cosine of two list columns, identical fold order
    * to [[cosine]].
    */
  private def cosineSql(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip($a, $b),
       |           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)""".stripMargin

  private val sigSql =
    s"""list_aggregate(list_transform(range(0, $Bands), j ->
       |  CASE WHEN list_sum(list_transform(
       |         embedding[1 + j * $DimsPerBand : $DimsPerBand + j * $DimsPerBand],
       |         x -> CAST(x AS DOUBLE))) > 0
       |       THEN '1' ELSE '0' END), 'string_agg', '')""".stripMargin

  val oracles: Map[String, String] = Map(
    "q38_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE label = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |         ${cosineSql("q.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.q_id)
         |SELECT q_id, neighbor_id, rn, cosine FROM (
         |  SELECT q_id, neighbor_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
         |  FROM scored)
         |WHERE rn <= 5""".stripMargin,

    "q52_ann_multiprobe" ->
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, label, $sigSql AS sig
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb,
         |    unnest(list_prepend(sig, list_transform(range(0, $Bands), i ->
         |      substring(sig, 1, CAST(i AS INT)) ||
         |      (CASE WHEN substring(sig, CAST(i + 1 AS INT), 1) = '1'
         |            THEN '0' ELSE '1' END) ||
         |      substring(sig, CAST(i + 2 AS INT), $Bands - CAST(i AS INT) - 1))))
         |      AS sig
         |  FROM sigs WHERE label = 0),
         |cands AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |         ${cosineSql("q.q_emb", "e.embedding")} AS cosine
         |  FROM sigs e JOIN q ON e.sig = q.sig
         |  WHERE e.vec_id <> q.q_id)
         |SELECT q_id, neighbor_id, rn, cosine FROM (
         |  SELECT q_id, neighbor_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
         |  FROM cands)
         |WHERE rn <= 3""".stripMargin,

    "q39_ann_buckets" ->
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, label, $sigSql AS sig
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, sig
         |      FROM sigs WHERE label = 0),
         |cands AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |         ${cosineSql("q.q_emb", "e.embedding")} AS cosine
         |  FROM sigs e JOIN q ON e.sig = q.sig
         |  WHERE e.vec_id <> q.q_id)
         |SELECT q_id, neighbor_id, rn, cosine FROM (
         |  SELECT q_id, neighbor_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
         |  FROM cands)
         |WHERE rn <= 3""".stripMargin
  )
}

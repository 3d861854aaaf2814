package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's map stage: every chunk goes to a chat model with the
  * user prompt as the system message and the chunk text as the user
  * message (`/root/reference/internal/cli/mapreduce.go:151-197`). The
  * client is an interface so tests can inject a mock — the direct analog
  * of `ChatGenerator` (`internal/openai/chat.go:13-16`).
  *
  * This engine is zero-egress by contract, so the production
  * implementation is pluggable and the shipped clients are deterministic
  * stand-ins. The Spark-side plumbing (distribution, ordering, caching,
  * fail-fast) is identical whichever client is plugged in.
  */
trait ModelClient extends Serializable {
  def complete(systemPrompt: String, userText: String): String
}

/** Deterministic stand-in for the reference's flagship semantics: the
  * engine appends "Return the lines that you want to keep"
  * (`mapreduce.go:91`), i.e. the canonical query is a line-level filter.
  * This client keeps the lines containing `keyword` — a local,
  * reproducible model of the semantic filter in
  * `examples/product-ratings/prompt.txt`.
  */
final case class KeywordFilterClient(keyword: String) extends ModelClient {
  override def complete(systemPrompt: String, userText: String): String =
    userText.split("\n", -1).iterator.filter(_.contains(keyword)).mkString("\n")
}

/** Identity client: echoes the chunk (useful for plumbing tests). */
final case class EchoClient() extends ModelClient {
  override def complete(systemPrompt: String, userText: String): String = userText
}

object LlmMap {
  /** Suffix the reference injects into every prompt (mapreduce.go:91). */
  val FilterSuffix = "\nReturn the lines that you want to keep."

  /** Map stage: chunks(chunk_id, text, ...) -> + result column.
    * Runs as a distributed map over however many partitions the chunk
    * table has; Spark's task scheduler replaces the reference's
    * one-goroutine-per-chunk errgroup (mapreduce.go:93-122), with the
    * same fail-fast job-abort semantics on error.
    */
  def mapChunks(chunks: DataFrame, client: ModelClient, prompt: String,
                textCol: String = "text",
                resultCol: String = "result"): DataFrame = {
    val sys = prompt + FilterSuffix
    val call = udf((text: String) => client.complete(sys, text))
    chunks.withColumn(resultCol, call(col(textCol)))
  }
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE canonical word definition, shared by every text operator (dedup
  * shingles, tf-idf terms, quality scores, salted counts) and its
  * DuckDB oracle twin — one place, so the Spark and SQL sides cannot
  * drift independently: a maximal run of non-whitespace characters in
  * the lower-cased text. (Token COUNTING has its own canonical
  * definition in graft.expressions.TokenCount.)
  */
object TextOps {
  def wordsOf(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), w => length(w) > 0)

  /** DuckDB twin of [[wordsOf]] over a column named `text`. */
  val wordsSql: String =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> length(w) > 0)"
}

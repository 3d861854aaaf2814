package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ExprBridge

/** Column-level entry points for graft's native Catalyst expressions. */
object functions {
  /** BPE-ish token estimate per string (see [[expressions.TokenCount]]). */
  def token_count(c: Column): Column =
    ExprBridge.column(expressions.TokenCount(ExprBridge.expression(c)))
}

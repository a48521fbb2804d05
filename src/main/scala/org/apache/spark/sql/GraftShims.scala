package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column <-> Expression converters — the
  * standard pattern for Spark-extension libraries that define custom
  * Catalyst expressions (the public `Column` API no longer exposes an
  * Expression constructor since the Connect refactor). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` since Spark 4 — re-exported so
    * graft expressions can declare `inputTypes` from outside the sql
    * package. NB: plain `ExpectsInputTypes` only CHECKS (and resolves
    * NullType); it is `ImplicitCastInputTypes` that additionally makes the
    * analyzer insert implicit casts on mismatched children — graft kernels
    * use the latter so numeric widening (array<float> embeddings →
    * array<double>) happens in analysis for SQL and Column callers alike. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ⇄ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), required to expose custom
  * Catalyst expressions as user-facing `Column`s in Spark 4. This is the
  * standard extension-library technique; no Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

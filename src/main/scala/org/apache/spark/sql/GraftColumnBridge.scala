package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package to wrap a raw Catalyst Expression as a
  * public Column (Spark 4 made the Expression-based Column constructor
  * internal). This is the standard extension-library pattern; no Spark
  * internals are modified. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}

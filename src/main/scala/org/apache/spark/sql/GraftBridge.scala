package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  * Spark 4 made the Column companion private[sql]; this is the usual
  * extension-library shim (a one-object file inside the sql package).
  */
object GraftBridge {
  import org.apache.spark.sql.classic.ClassicConversions.ColumnConstructorExt

  def column(e: Expression): Column = Column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnConversions.expression(c)
}

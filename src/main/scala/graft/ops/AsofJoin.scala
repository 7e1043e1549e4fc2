package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark has no native plan for (SURVEY §2.5
  * joins row): for every left row, attach the payload of the LATEST
  * right row with the same key and right.ts <= left.ts.
  *
  * Composed from existing operators per the custom-operator preference
  * order (compose > custom Expression > custom plan): tag both sides,
  * `unionByName(allowMissingColumns)`, then one window pass per key in
  * time order with a `last(payload, ignoreNulls)` carry-forward. Right
  * rows sort BEFORE left rows on timestamp ties, making the match
  * inclusive. One shuffle on the key — the same cost class as a regular
  * sort-merge join, and skew-safe under AQE.
  */
object AsofJoin {

  /** Returns all left columns plus `outName` = carried right payload
    * (null when no right row precedes the left row).
    */
  def asof(left: DataFrame, right: DataFrame,
           key: String, ts: String, rightPayload: String,
           outName: String = "asof_payload"): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left.withColumn("__side", lit(1))
    val rTagged = right.select(
        col(key), col(ts), col(rightPayload).as("__payload"))
      .withColumn("__side", lit(0))

    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .withColumn(outName, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(outName)): _*)
  }
}

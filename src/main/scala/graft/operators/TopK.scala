package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k selection shapes (SURVEY.md §4):
  *
  *   - global: `orderBy(...).limit(k)` — Spark plans
  *     `TakeOrderedAndProject`: each partition keeps its local top-k,
  *     the driver merges p×k rows. No full sort at any scale.
  *   - per group: window `row_number` + filter — ONE shuffle on the
  *     group key; the sort is per-partition. The streaming-friendly
  *     alternative to a global sort per group.
  */
object TopK {

  /** Global top-k by `order` (descending columns supplied by caller). */
  def global(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k; emits the input columns plus a `rank` column. */
  def perGroup(df: DataFrame, groupCols: Seq[String], k: Int, order: Column*): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

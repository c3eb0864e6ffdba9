package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge — the standard library technique for
  * building a DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
  * sql-private). The one graft class outside the graft package; used
  * only by `graft.plans`. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

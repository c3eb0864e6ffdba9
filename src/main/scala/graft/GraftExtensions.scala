package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions

/** Config-driven injection of graft's native functions and planner
  * strategies: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes vec_dot / minhash_sig / simhash64 / … available in every
  * session of the cluster without any code calling
  * [[GraftFunctions.register]], and plans [[graft.plans.AsOfJoinPlan]]
  * through its streaming-merge physical operator.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach { case (id, info, builder) =>
      extensions.injectFunction((id, info, builder))
    }
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
  }
}

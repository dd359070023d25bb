package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** MapReduce-counter analog (SURVEY §2.1 S8/S10), Spark-native form.
  *
  * The reference publishes job counters by re-reading outputs and
  * POSTing to WebHDFS (App.java:70-91) — an extra pass per metric.
  * `Observation` attaches named aggregate metrics to the plan itself:
  * they are computed as a side effect of whatever action runs next
  * (a write, a count), costing zero extra passes over the data at any
  * scale.
  */
object Counters {

  /** Attach named counter expressions to a frame. The metrics resolve
    * after the next action on the returned frame; read them with
    * `observation.get` (blocks until the action completes).
    */
  def observed(
      df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one counter expression")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

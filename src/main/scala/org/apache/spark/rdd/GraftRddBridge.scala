package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is `private[rdd]`; graft's DfMemo uses
  * it to tell dead per-iteration localCheckpoint pins apart from cache
  * buffers when releasing compute intermediates (r14) — the same
  * same-package shim pattern as [[org.apache.spark.sql.GraftSqlBridge]].
  */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}

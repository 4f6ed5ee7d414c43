package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: turn a custom LogicalPlan into a DataFrame.
  * `classic.Dataset.ofRows` is private[sql] in Spark 4, so third-party
  * operator libraries (this one, Sedona, Delta, …) expose it through a
  * one-liner in the org.apache.spark.sql package. Nothing else may live
  * here — all graft logic stays under the graft.* packages.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Force-create the driver's StateStoreCoordinator RPC endpoint. A
    * streaming query does this on start; BATCH transformWithState also
    * needs it (its state store loads consult the coordinator) but nothing
    * creates it on a purely-batch session — tasks then die with
    * RpcEndpointNotFoundException. Touching the manager's lazy val is the
    * supported-path equivalent of starting a first stream. */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].streams.stateStoreCoordinator
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway the engine's custom logical operators
  * need: wrapping a [[LogicalPlan]] back into a user-facing [[DataFrame]].
  * Spark exposes no public constructor for this on purpose, and the
  * conventional extension-library answer (Delta, Sedona, Iceberg all ship
  * the same shim) is a single object inside the `org.apache.spark.sql`
  * namespace. Everything else in the engine stays in `graft.*` and uses
  * only public API — keep it that way; this file must remain the complete
  * list of internals we touch.
  */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

package graft

import org.apache.spark.sql.DataFrame

/** Checkpoint-block hygiene shared by the iterative-MV kernels and the
  * gate queries: a `localCheckpoint(true)` frame's blocks live on its
  * LogicalRDD, so `Dataset.unpersist` alone would be a no-op — freeing
  * means unpersisting THAT RDD. Iterative maintenance (CDC MV loops,
  * banded self-joins) supersedes a checkpointed state every round;
  * without in-loop freeing a bench pass pins every superseded
  * generation until JVM exit and wall time becomes hostage to
  * block-manager pressure (the r13 ±2.24× same-code bench swing).
  *
  * Only free a frame once EVERY consumer has materialized — a
  * truncated-lineage checkpoint cannot be recomputed.
  */
object Ckpt {

  /** Free a consumed localCheckpoint's blocks (no-op-safe on
    * non-checkpointed frames). */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => df.unpersist(false)
    }
}

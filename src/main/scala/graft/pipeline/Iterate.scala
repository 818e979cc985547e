package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (cluster collapse,
 *  Lloyd refinement): each round must restart from a materialized leaf
 *  or the analyzed plan doubles per round (measured: exponential driver
 *  OOM at component diameter ≈ 9).
 *
 *  `localCheckpoint` blocks live on executors — fast, but a lost
 *  executor kills the query, which is unacceptable for a long loop on a
 *  1000-executor cluster. When the SparkContext has a checkpoint
 *  directory configured (`sc.setCheckpointDir`, the standard warehouse
 *  deployment step), truncation upgrades to a RELIABLE `checkpoint()`:
 *  blocks persist to the checkpoint filesystem and survive executor
 *  loss. Local mode and tests need no configuration and keep the fast
 *  path. */
private[pipeline] object Iterate {

  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}

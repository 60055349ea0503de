package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Reuse point for DataFrames consumed by several downstream branches
  * (both sides of a self-join, sizes + intersections, ...).
  *
  * Two strategies, selected by `spark.graft.materialize`:
  *
  *  - `localCheckpoint` (default — right for local[*] and tests): cuts
  *    lineage and pins blocks to executors. Fast, but NOT fault-tolerant:
  *    blocks have no replication and no recompute path, so on a real
  *    cluster one lost executor (or dynamic-allocation scale-in) kills
  *    the job.
  *  - `persist`: DISK_ONLY persist keeps the lineage, so a lost block is
  *    recomputed instead of failing the job — the setting a 1000-executor
  *    deployment should run with.
  *
  * Both strategies are lazy: the first action populates the blocks.
  */
object Materialize {
  val ConfKey = "spark.graft.materialize"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case "persist" => df.persist(StorageLevel.DISK_ONLY)
      case _ => df.localCheckpoint(false)
    }
}

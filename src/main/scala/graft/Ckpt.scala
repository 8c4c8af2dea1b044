package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lineage-truncating checkpoint for the iterative stages (Louvain hops,
  * community summarization barriers), with an executor-loss-resilience
  * switch for real clusters.
  *
  * `localCheckpoint` is the right call shape here — it truncates lineage
  * without the HDFS round-trip of a reliable checkpoint — but its blocks
  * live on exactly one executor: lose that executor and the job dies with
  * `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND` (observed on this chain under
  * `local-cluster` when an executor OOMed — the lineage is gone, Spark
  * cannot recompute). On a 1000-executor cluster, where single-executor
  * loss is routine (preemption, hardware), set
  *
  *   spark.graft.checkpoint.replicated = true
  *
  * and every chain checkpoint stores MEMORY_AND_DISK_2 — each block has a
  * second replica on another executor, so any single loss is survivable.
  * Default stays unreplicated: on one box (local[N] — a single block
  * manager, nowhere to replicate to) replication buys nothing and the
  * memory cost is real. The frames checkpointed here are the SMALL
  * iterative states (node→community labels, coarsened edge lists —
  * contraction happens before iteration), so 2× on them is cheap relative
  * to the corpus.
  */
object Ckpt {
  val ReplicatedConf = "spark.graft.checkpoint.replicated"

  /** Eager local checkpoint honoring [[ReplicatedConf]]. */
  def local[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.conf.get(ReplicatedConf, "false").toBoolean)
      ds.localCheckpoint(eager = true, storageLevel = StorageLevel.MEMORY_AND_DISK_2)
    else ds.localCheckpoint(eager = true)
}

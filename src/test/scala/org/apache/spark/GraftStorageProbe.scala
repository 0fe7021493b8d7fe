package org.apache.spark

import org.apache.spark.storage.BroadcastBlockId

/** Test-only window into the block manager (this file lives in the
  * org.apache.spark package purely to reach the private[spark] env):
  * BroadcastLifecycleSpec uses it to MEASURE that per-call broadcasts
  * are reclaimed by the ContextCleaner rather than accumulating —
  * turning a documentation claim into an executable assertion. */
object GraftStorageProbe {

  /** Distinct live broadcast ids holding blocks anywhere. */
  def broadcastBlockCount(sc: SparkContext): Int =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }
      .distinct.size

  /** Bytes of storage memory in use across block managers. */
  def storageMemoryUsed(sc: SparkContext): Long =
    sc.env.blockManager.master.getMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-data pipelines: group documents into packs
  * whose token totals stay within a context-window capacity. Shape:
  *
  *  - the parallelism unit is a VALUE (group = id mod n), not a physical
  *    partition id — groupByKey + flatMapSortedGroups makes the grouping
  *    and in-group order part of the data, so packs are identical run over
  *    run regardless of AQE coalescing, partition layout, or cluster size.
  *    (A TaskContext.getPartitionId formulation measurably diverged the
  *    moment AQE re-planned one side of a comparison query.)
  *  - NEXT-FIT greedy per group, streaming over the sorted iterator: O(1)
  *    state per task, no group buffering — a 100 TB corpus packs in one
  *    narrow pass after the group shuffle;
  *  - a document larger than `capacity` gets a singleton pack (callers
  *    truncate or split upstream);
  *  - pack ids are (group << 32) | in-group index — globally unique and
  *    deterministic, no driver-side coordination.
  */
object Packing {

  final case class PackedDoc(doc_id: Long, n_tokens: Long, pack_id: Long)

  /** @param groups number of value-keyed pack groups. The default is a
    *        CONSTANT (not spark.sql.shuffle.partitions) precisely so the
    *        same corpus packs identically on a laptop and a 1000-executor
    *        cluster; raise it when one group's docs exceed a task's
    *        comfortable scan size.
    */
  def packGreedy(docs: DataFrame, idCol: String, nTokensCol: String,
                 capacity: Long, groups: Int = 64): DataFrame = {
    require(capacity > 0 && groups > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val n = groups
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
              col(nTokensCol).cast(LongType).as("n_tokens"),
              pmod(col(idCol).cast(LongType), lit(n.toLong)).as("grp"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapSortedGroups($"doc_id") { (grp, rows) =>
        var packIdx = 0L
        var used = 0L
        rows.map { case (id, tokens, _) =>
          // close the open pack when this doc does not fit (used > 0 guard:
          // an oversized doc entering an EMPTY pack stays a singleton, and
          // the next doc closes it via this same test)
          if (used > 0 && used + tokens > capacity) { packIdx += 1; used = 0L }
          used += tokens
          PackedDoc(id, tokens, (grp << 32) | packIdx)
        }
      }
      .toDF()
  }
}

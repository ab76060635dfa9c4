package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbour search over an ARRAY<FLOAT> embedding
  * column (SURVEY §2.2 Q29 + the similarity-search north-star item).
  *
  * - [[bruteTopK]] — exact baseline: probe broadcast against a single scan,
  *   top-k via TakeOrderedAndProject. O(n) per probe, zero shuffle.
  * - [[lshTopK]] — the scale path: random-hyperplane bucket signatures with
  *   multi-probe over a hamming ring. The scan side is bucketed ONCE
  *   (writeable as a bucketed table at 100 TB); each query touches only
  *   candidate buckets, so cost tracks ring size, not corpus size.
  */
object Ann {

  /** Exact cosine top-k neighbours of `probeId`. */
  def bruteTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                probeId: Long, k: Int): DataFrame = {
    val probe = embeddings.filter(col(idCol) === probeId)
      .select(col(vecCol).as("_probe_vec"))
    embeddings.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol),
              round(VectorOps.cosine(col(vecCol), col("_probe_vec")), 4)
                .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Attach a hyperplane-LSH bucket id (deterministic planes, fixed seed). */
  def withBucket(embeddings: DataFrame, vecCol: String,
                 nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame =
    embeddings.withColumn("bucket",
      VectorOps.hyperplaneBucket(col(vecCol), VectorOps.fixedPlanes(nPlanes, dim, seed)))

  /** Approximate cosine top-k: search only vectors whose bucket is within
    * `ring` hamming distance of the probe's bucket (multi-probe LSH).
    * Recall/ cost trade-off is (nPlanes, ring); on low-cosine corpora use a
    * wider ring — the neighbour's sign pattern differs on more planes.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, nPlanes: Int = 8, dim: Int = 64,
              ring: Int = 3): DataFrame = {
    val bucketed = withBucket(embeddings, vecCol, nPlanes, dim)
    val probe = bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("_probe_vec"), col("bucket").as("_probe_bucket"))
    bucketed.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .filter(bit_count(col("bucket").bitwiseXOR(col("_probe_bucket"))) <= ring)
      .select(col(idCol),
              round(VectorOps.cosine(col(vecCol), col("_probe_vec")), 4)
                .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

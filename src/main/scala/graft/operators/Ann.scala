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

  /** IVF (inverted-file) variant: a KMeans coarse quantizer over the
    * L2-NORMALIZED vectors (so L2 cells == cosine cells) partitions the
    * corpus into `nCentroids` cells; a query scans only the `nProbe` cells
    * whose centroids are nearest the probe. At 100 TB the assignment is a
    * one-time write (partitionBy cell), the model is trained on a sample,
    * and each query reads nProbe/nCentroids of the data.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, nCentroids: Int = 8,
              nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // hoist the norm into a column: a dot inside the transform lambda would
    // recompute the full self-product per ELEMENT (O(d²) per row)
    val unit = embeddings
      .withColumn("_nrm", sqrt(VectorOps.dot(col(vecCol), col(vecCol))))
      .withColumn("_unit", transform(col(vecCol), x => x.cast("double") / col("_nrm")))
      .withColumn("_features", array_to_vector(col("_unit")))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(unit)
    val assigned = model.transform(unit)
    val probeVec = assigned.filter(col(idCol) === probeId)
      .select("_unit").head().getSeq[Double](0).toArray
    // nProbe nearest cells to the probe, by centroid distance (driver-side:
    // centroids are tiny)
    val cells = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val d = c.toArray.zip(probeVec).map { case (a, b) => (a - b) * (a - b) }.sum
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1)
    val probe = assigned.filter(col(idCol) === probeId)
      .select(col(vecCol).as("_probe_vec"))
    assigned.filter(col(idCol) =!= probeId)
      .filter(col("_cell").isin(cells.toSeq: _*))
      .crossJoin(broadcast(probe))
      .select(col(idCol),
              round(VectorOps.cosine(col(vecCol), col("_probe_vec")), 4)
                .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

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

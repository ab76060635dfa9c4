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
    // limit(1) is a no-op (ids are unique) that makes the 1-row bound
    // PROVABLE (maxRows==1), so the plan audit can tell this scalar attach
    // from a genuine unbounded nested loop
    val probe = embeddings.filter(col(idCol) === probeId)
      .select(col(vecCol).as("_probe_vec")).limit(1)
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
      .select(col(vecCol).as("_probe_vec")).limit(1)
    assigned.filter(col(idCol) =!= probeId)
      .filter(col("_cell").isin(cells.toSeq: _*))
      .crossJoin(broadcast(probe))
      .select(col(idCol),
              round(VectorOps.cosine(col(vecCol), col("_probe_vec")), 4)
                .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** All bucket ids within `ring` hamming distance of `center` — the
    * multi-probe candidate set, enumerable because it depends only on
    * (nPlanes, ring), never on the data.
    */
  def ringBuckets(center: Long, nPlanes: Int, ring: Int): Seq[Long] =
    (0L until (1L << nPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= ring)
      .map(center ^ _)

  private def scoreTopK(candidates: DataFrame, probe: DataFrame, idCol: String,
                        vecCol: String, probeId: Long, k: Int): DataFrame =
    candidates.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol),
              round(VectorOps.cosine(col(vecCol), col("_probe_vec")), 4)
                .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Approximate cosine top-k: search only vectors whose bucket is within
    * `ring` hamming distance of the probe's bucket (multi-probe LSH). The
    * ring's bucket ids are enumerated up front and pushed as
    * `bucket.isin(...)` — a plain pushable predicate, so over in-memory
    * frames it short-circuits per row, and over bucket-partitioned storage
    * ([[lshTopKBucketed]]) it prunes whole partitions before any IO.
    * Recall/cost trade-off is (nPlanes, ring); on low-cosine corpora use a
    * wider ring — the neighbour's sign pattern differs on more planes.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, nPlanes: Int = 8, dim: Int = 64,
              ring: Int = 3): DataFrame = {
    val bucketed = withBucket(embeddings, vecCol, nPlanes, dim)
    // one driver-side row to anchor the candidate set (same legitimacy as
    // ivfTopK's probe lookup — a probe is a scalar by nature). An absent
    // probe id returns an empty top-k, same as bruteTopK.
    bucketed.filter(col(idCol) === probeId)
      .select(col("bucket")).limit(1).collect().headOption match {
      case None => scoreTopK(bucketed.limit(0),
        bucketed.limit(0).select(col(vecCol).as("_probe_vec")),
        idCol, vecCol, probeId, k)
      case Some(row) =>
        val candidates = ringBuckets(row.getLong(0), nPlanes, ring)
        val probe = bucketed.filter(col(idCol) === probeId)
          .select(col(vecCol).as("_probe_vec")).limit(1)
        scoreTopK(bucketed.filter(col("bucket").isin(candidates: _*)),
                  probe, idCol, vecCol, probeId, k)
    }
  }

  /** All-queries-at-once multi-probe LSH top-k — the production shape of
    * similarity search (a training pipeline matches MILLIONS of probes,
    * not one). Every query row explodes to its hamming-ring bucket ids
    * and equi-joins the bucketed corpus on the bucket, so ONE shuffled
    * join serves the whole query set instead of a driver-side loop of
    * per-probe jobs; the per-query top-k cut then happens in the
    * bounded-buffer [[TopK]] aggregate, so the map side already reduces
    * each (mapper, query) to ≤ k candidates before the final shuffle.
    * Score and tie-break semantics match [[lshTopK]] exactly
    * (round(cosine, 4) DESC, id ASC, self-matches excluded) — asserted
    * probe-by-probe in TopKSpec. Output: (qid, rnk, cid, score).
    *
    * `excludeSelf = true` (the default) assumes queries and corpus share
    * ONE id space — probes drawn from the corpus, as in [[lshTopK]] — and
    * drops qid == cid matches as self-pairs. When the query set is an
    * EXTERNAL table whose ids may coincidentally collide with corpus ids,
    * pass `excludeSelf = false` so an id collision doesn't silently drop
    * a valid nearest neighbour.
    */
  def lshTopKBatch(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
                   ring: Int = 3, excludeSelf: Boolean = true): DataFrame = {
    val masks: Seq[Long] = (0L until (1L << nPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= ring)
    val c = withBucket(corpus, vecCol, nPlanes, dim)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"), col("bucket"))
    // Explode ONE array literal of ring masks and XOR after: an
    // array(bucket XOR lit(m), ...) of C(nPlanes, <=ring) elements blows
    // the codegen method-size limit past ~100 masks (nPlanes >= 10) and
    // drops the whole probe stage — including the downstream cosine — to
    // interpreted eval (measured 120 s vs 12 s at nPlanes=11 on the 10x
    // corpus). The literal-array form keeps the expression tree O(1) in
    // ring size, so retuning nPlanes for a denser corpus stays codegen'd.
    val q = withBucket(queries, vecCol, nPlanes, dim)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col("bucket"), explode(lit(masks.toArray)).as("_mask"))
      .select(col("qid"), col("qvec"),
        col("bucket").bitwiseXOR(col("_mask")).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .select(col("qid"), col("cid"),
              // same arg order as scoreTopK: cosine(corpus vec, probe vec)
              round(VectorOps.cosine(col("cvec"), col("qvec")), 4).as("score"))
    TopK.perGroup(scored, Seq("qid"), "score", "cid", k)
  }

  /** Exact-arithmetic top-k over the int8-QUANTIZED storage form
    * (VectorOps.quantizeInt8): vectors dequantize on the fly inside the
    * scan, so the corpus at rest and on the wire is 4× smaller while the
    * scoring path is unchanged. Recall vs float32 brute force is bounded
    * by the quantization's cosine drift (<2%, QuantizeSpec) — AnnSpec
    * asserts the top-k overlap.
    */
  def bruteTopKQuantized(quantized: DataFrame, idCol: String, qvCol: String,
                         probeId: Long, k: Int): DataFrame = {
    val deq = VectorOps.dequantizeInt8(col(qvCol))
    val probe = quantized.filter(col(idCol) === probeId)
      .select(VectorOps.dequantizeInt8(col(qvCol)).as("_probe_vec")).limit(1)
    quantized.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol),
              round(VectorOps.cosine(deq, col("_probe_vec")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** One-time ingest-side write of the corpus partitioned by LSH bucket —
    * the storage layout that makes ANN queries PRUNE at the source. At
    * 100 TB this is the difference between "read 2^nPlanes-ths of the
    * corpus per query" and "read everything, filter later".
    */
  def writeBucketed(embeddings: DataFrame, vecCol: String, path: String,
                    nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): Unit =
    withBucket(embeddings, vecCol, nPlanes, dim, seed)
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** [[lshTopK]] against a [[writeBucketed]] corpus: the enumerated ring ids
    * become PartitionFilters on the parquet scan (asserted in AnnSpec), so
    * only candidate bucket directories are listed and read. The probe lookup
    * itself is pruned to the probe's own bucket once known.
    */
  def lshTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                      idCol: String, vecCol: String, probeId: Long, k: Int,
                      nPlanes: Int = 8, ring: Int = 3): DataFrame = {
    import spark.implicits._
    val corpus = spark.read.parquet(path)
    // partition-column values of small integers are inferred IntegerType on
    // read — match the literal type so isin stays a partition filter
    val isInt = corpus.schema("bucket").dataType ==
      org.apache.spark.sql.types.IntegerType
    def lits(bs: Seq[Long]): Seq[Any] =
      if (isInt) bs.map(_.toInt) else bs
    // ONE unpruned id lookup fetches bucket AND vector together (the
    // bucket cannot be known before this lookup, so one full-index scan
    // is the floor — but only one); the candidate scan below is pruned.
    // Absent probe id → empty top-k, same as bruteTopK.
    corpus.filter(col(idCol) === probeId)
      .select(col("bucket").cast("long"), col(vecCol).cast("array<float>"))
      .limit(1).collect().headOption match {
      case None => scoreTopK(corpus.limit(0),
        corpus.limit(0).select(col(vecCol).as("_probe_vec")),
        idCol, vecCol, probeId, k)
      case Some(row) =>
        val candidates = ringBuckets(row.getLong(0), nPlanes, ring)
        val probe = Seq(row.getSeq[Float](1))
          .toDF("_probe_vec")
          .select(col("_probe_vec").cast("array<float>"))
        scoreTopK(corpus.filter(col("bucket").isin(lits(candidates): _*)),
                  probe, idCol, vecCol, probeId, k)
    }
  }
}

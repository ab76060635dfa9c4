package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.expressions.NativeExprs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-buffer top-k aggregate must be ROW-IDENTICAL to the window
  * row_number form it replaces at scale — including tie-breaks and the
  * partial-buffer merge/serialize path (exercised by many input
  * partitions between partial and final aggregation).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, group: String,
                         score: String, tag: String, k: Int) = {
    val w = Window.partitionBy(group).orderBy(col(score).desc, col(tag))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(group), col("rnk"), col(tag), col(score))
  }

  test("perGroup == window row_number on the tf-idf shape (string tags)") {
    val docs = Tables.documents(spark, sf0001)
    val tf = docs.select(col("doc_id"),
        explode(NativeExprs.tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"),
              col("tc.tf").cast("double").as("score"))
      .repartition(13) // force partial buffers on many mappers
    val got = TopK.perGroup(tf, Seq("doc_id"), "score", "token", 3)
      .select(col("doc_id"), col("rnk"), col("token"), col("score"))
    val want = windowTopK(tf, "doc_id", "score", "token", 3)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("perGroup — ties break by tag ASC, exactly like the window (long tags)") {
    // heavy ties: only 3 distinct scores across 200 rows per group
    val rows = for (g <- 1 to 5; i <- 1 to 200)
      yield (g.toLong, (i % 3).toDouble, i.toLong)
    val df = rows.toDF("g", "score", "tag").repartition(11)
    val got = TopK.perGroup(df, Seq("g"), "score", "tag", 7)
      .select(col("g"), col("rnk"), col("tag"), col("score"))
    val want = windowTopK(df, "g", "score", "tag", 7)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // groups smaller than k return all their rows, still ranked
    val small = Seq((1L, 5.0, 10L), (1L, 7.0, 11L)).toDF("g", "score", "tag")
    val g2 = TopK.perGroup(small, Seq("g"), "score", "tag", 7)
      .orderBy("rnk").collect()
    assert(g2.map(r => (r.getInt(1), r.getLong(2))).toSeq === Seq((1, 11L), (2, 10L)))
  }

  test("perGroup — null score/tag rows are ignored (aggregate null semantics)") {
    val df = Seq((1L, Some(2.0), Some(1L)), (1L, None, Some(2L)),
                 (1L, Some(3.0), None), (1L, Some(1.0), Some(3L)))
      .toDF("g", "score", "tag")
    val got = TopK.perGroup(df, Seq("g"), "score", "tag", 5)
      .orderBy("rnk").collect()
    assert(got.map(r => (r.getInt(1), r.getLong(2))).toSeq === Seq((1, 1L), (2, 3L)))
  }

  test("lshTopKBatch — per-probe rows equal the single-probe operator") {
    val e = Tables.embeddings(spark, sf0001)
    val probeIds = Seq(0L, 7L, 23L, 111L)
    val queries = e.filter(col("vec_id").isin(probeIds: _*))
    val batch = Ann.lshTopKBatch(e, queries, "vec_id", "embedding", k = 5)
      .collect().groupBy(_.getLong(0))
    probeIds.foreach { pid =>
      val single = Ann.lshTopK(e, "vec_id", "embedding", pid, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch.getOrElse(pid, Array.empty).sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got === single, s"probe $pid: batch $got != single $single")
    }
    // the whole batch is ONE plan — no per-probe jobs — and the cut is an
    // aggregate, not a window
    val plan = Ann.lshTopKBatch(e, queries, "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("top_k_by_score"), plan)
  }
}

package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** int8 embedding quantization: 4× smaller storage with bounded cosine
  * error — verified on the real embedding corpus, not synthetic vectors.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize/dequantize round trip keeps cosine within 2% on the corpus") {
    val e = Tables.embeddings(spark, sf0001)
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("pe"))
    val both = e.filter($"vec_id" =!= 0)
      .withColumn("deq",
        VectorOps.dequantizeInt8(VectorOps.quantizeInt8($"embedding")))
      .crossJoin(broadcast(probe))
      .select(
        VectorOps.cosine($"embedding", $"pe").as("exact"),
        VectorOps.cosine($"deq", $"pe").as("approx"))
    val worst = both.select(max(abs($"exact" - $"approx"))).head().getDouble(0)
    assert(worst < 0.02, s"worst cosine drift $worst")
  }

  test("schema is 4x smaller at rest; zero vectors survive") {
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("qv", VectorOps.quantizeInt8($"embedding"))
    // tinyint elements: 1 byte vs 4 — the struct schema proves the layout
    val qType = e.schema("qv").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(qType("q").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    // an all-zero vector quantizes to scale 0 and dequantizes to zeros
    val zeros = Seq(Seq.fill(8)(0.0f)).toDF("embedding")
      .withColumn("deq",
        VectorOps.dequantizeInt8(VectorOps.quantizeInt8($"embedding")))
      .select(aggregate($"deq", lit(0.0), (a, x) => a + abs(x)))
      .head().getDouble(0)
    assert(zeros === 0.0)
  }
}

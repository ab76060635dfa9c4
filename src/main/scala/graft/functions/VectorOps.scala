package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector primitives over ArrayType(FloatType) embedding columns.
  * Pure higher-order built-ins (zip_with + aggregate) — codegen-resident,
  * no UDF serialization, and a deterministic left-to-right fold so results
  * are partition-layout independent (SURVEY §7.3).
  */
object VectorOps {

  /** Dot product in double precision (floats are widened first; each
    * float*float product is exact in double). Higher-order-function
    * formulation — kept as the value-semantics reference; the hot paths use
    * the codegen'd [[graft.functions.expressions.NativeExprs.dotF32]],
    * which computes the identical left-to-right double sum.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product — same values as [[dotHof]], ~50× faster inside
    * O(n²) similarity joins.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.NativeExprs.dotF32(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with precomputed norms — for self-join shapes where norms are
    * computed once per row instead of once per pair.
    */
  def cosinePrenorm(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Squared L2 distance (for IVF-style bucketing). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dx = x.cast(DoubleType) - y.cast(DoubleType); dx * dx
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: the sign bits of
    * `planes.length` fixed random projections packed into a BIGINT. Vectors
    * with high cosine land in the same bucket with high probability —
    * the scale path for ANN: shuffle by bucket, search within buckets.
    * Native evaluation (this runs over EVERY vector at corpus scale);
    * [[hyperplaneBucketHof]] is the value-semantics reference.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.expressions.NativeExprs.hyperplaneBucket(v, planes)

  /** Higher-order-function formulation of [[hyperplaneBucket]] —
    * value-identical.
    */
  def hyperplaneBucketHof(v: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(v, array(p.toIndexedSeq.map(lit): _*), (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << (planes.length - 1 - i))).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Symmetric int8 quantization of an ARRAY<FLOAT> embedding: a struct of
    * (scale, ARRAY<TINYINT>) where scale = max|x| / 127 and each value is
    * round(x / scale). 4× smaller at rest and on the shuffle wire than
    * float32 — the storage form for 100 TB embedding corpora; similarity
    * search dequantizes on the fly ([[dequantizeInt8]]) with ~1e-2 cosine
    * error at 64 dims (QuantizeSpec bounds it). All-zero vectors keep
    * scale 0 and dequantize to zeros.
    */
  def quantizeInt8(v: Column): Column = {
    val scale = aggregate(v, lit(0.0f),
      (acc, x) => greatest(acc, abs(x))) / 127.0f
    struct(
      scale.cast(FloatType).as("scale"),
      when(scale === 0f,
          transform(v, _ => lit(0).cast(ByteType)))
        .otherwise(transform(v, x => round(x / scale).cast(ByteType)))
        .as("q"))
  }

  /** Inverse of [[quantizeInt8]]: ARRAY<FLOAT> ≈ the original vector. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"),
      b => (b.cast(FloatType) * qv.getField("scale")).cast(FloatType))

  /** Deterministic pseudo-random unit-ish hyperplanes (splitmix64-derived,
    * fixed seed) — stable across runs and JVMs.
    */
  def fixedPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    var state = seed
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(nPlanes)(Array.fill(dim)(next().toDouble / Long.MaxValue))
  }
}

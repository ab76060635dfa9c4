// Hosted under org.apache.spark.sql like NativeExprs (private[sql] surface).
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: at most k (score, tag) entries, kept sorted by
  * (score DESC, tag ASC). Insertion is binary-search + arraycopy — k is
  * small by contract, and a row worse than the current k-th is rejected
  * with a single comparison, which is the common case on large groups.
  */
final class TopKBuf(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val tags = new Array[AnyRef](k)

  // rank order: score DESC, tag ASC (tag is Long or UTF8String)
  private def before(s: Double, t: AnyRef, i: Int): Boolean = {
    val c = java.lang.Double.compare(scores(i), s)
    if (c != 0) c < 0
    else (t, tags(i)) match {
      case (a: java.lang.Long, b: java.lang.Long) => a < b
      case (a: UTF8String, b: UTF8String) => a.compareTo(b) < 0
      case _ => false
    }
  }

  def insert(s: Double, t: AnyRef): Unit = {
    if (n == k && !before(s, t, n - 1)) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, t, mid)) hi = mid else lo = mid + 1
    }
    val pos = lo
    val last = math.min(n, k - 1)
    System.arraycopy(scores, pos, scores, pos + 1, last - pos)
    System.arraycopy(tags, pos, tags, pos + 1, last - pos)
    scores(pos) = s
    tags(pos) = t
    if (n < k) n += 1
  }
}

/** Exact top-k per group by (score DESC, tag ASC) as a Catalyst aggregate —
  * the scale-correct alternative to `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC, tag) <= k`: a window must SHUFFLE AND SORT every
  * input row, while this aggregate's partial state is a bounded k-entry
  * buffer, so map-side combine ships at most k rows per (mapper, group)
  * and the reducer merges tiny buffers. Null score or tag rows are ignored
  * (standard aggregate null semantics). Output is
  * `array<struct<score double, tag T>>` in rank order, T ∈ {long, string}.
  */
case class TopKByScore(score: Expression, tag: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with ImplicitCastInputTypes {
  require(k >= 1 && k <= 65536, "k out of range")

  // type validation happens AFTER resolution (a constructor require on
  // tag.dataType would throw on still-unresolved children); integral
  // scores coerce to double
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, TypeCollection(LongType, StringType))

  override def children: Seq[Expression] = Seq(score, tag)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("tag", tag.dataType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val t = tag.eval(input)
    if (s != null && t != null) {
      // a UTF8String from eval() may be a VIEW into a reused row buffer —
      // copy before it outlives this row, or later rows corrupt the heap
      val owned = t match {
        case u: UTF8String => u.clone()
        case other => other.asInstanceOf[AnyRef]
      }
      buf.insert(s.asInstanceOf[Double], owned)
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.scores(i), other.tags(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.scores(i), buf.tags(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.scores(i))
      buf.tags(i) match {
        case l: java.lang.Long => out.writeLong(l)
        case s: UTF8String =>
          val b = s.getBytes
          out.writeInt(b.length)
          out.write(b)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuf(k)
    val isLong = tag.dataType == LongType
    var i = 0
    // entries arrive already rank-ordered; insert keeps them so
    while (i < n) {
      val s = in.readDouble()
      val t: AnyRef =
        if (isLong) java.lang.Long.valueOf(in.readLong())
        else {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        }
      buf.insert(s, t)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), tag = newChildren(1))
}

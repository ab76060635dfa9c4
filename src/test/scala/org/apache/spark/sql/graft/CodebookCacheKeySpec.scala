package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.Platform
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the decoded-codebook cache key (r14 review): the
  * DataFrame-level NativeExprsSpec pin drives the real shuffle path;
  * this one isolates the hit rule itself — in particular the
  * reused-deserialization-buffer scenario, where (base, offset, length)
  * recur with DIFFERENT contents and a key-only cache silently returns
  * a stale decode.
  */
class CodebookCacheKeySpec extends AnyFunSuite {

  test("Unsafe path: identical contents hit, a mutated reused buffer does NOT") {
    val arr = UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L, 3L))
    val key = new CodebookCacheKey
    assert(!key.hit(arr)) // empty key never hits
    key.remember(arr)
    assert(key.hit(arr))
    // same wrapper object, same (base, offset, length) — contents change
    // under it, exactly what a reused row-deserialization buffer does
    Platform.putLong(arr.getBaseObject,
      arr.getBaseOffset + arr.getSizeInBytes - 8, 99L)
    assert(!key.hit(arr), "stale hit on a mutated reused buffer")
    key.remember(arr)
    assert(key.hit(arr)) // re-remembered contents hit again
    // a DIFFERENT buffer with EQUAL contents also hits (the broadcast
    // case: fresh UnsafeArrayData wrappers over equal bytes every row)
    val twin = UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L, 99L))
    assert(key.hit(twin))
    // different length never hits
    assert(!key.hit(UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L))))
  }

  test("non-Unsafe path: reference identity only (a Literal's stable object)") {
    val g1 = new GenericArrayData(Array[Any](1L, 2L))
    val g2 = new GenericArrayData(Array[Any](1L, 2L)) // equal, distinct object
    val key = new CodebookCacheKey
    key.remember(g1)
    assert(key.hit(g1))
    assert(!key.hit(g2), "identity path must not content-compare")
    // switching representation invalidates cleanly in both directions
    val u = UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L))
    assert(!key.hit(u))
    key.remember(u)
    assert(key.hit(u) && !key.hit(g1))
  }
}

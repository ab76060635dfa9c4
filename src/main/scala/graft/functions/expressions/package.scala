package graft.functions

/** Public facade for the native Catalyst expressions (implemented under
  * org.apache.spark.sql.graft to reach the private[sql] surface).
  */
package object expressions {
  val NativeExprs: org.apache.spark.sql.graft.NativeExprs.type =
    org.apache.spark.sql.graft.NativeExprs
}

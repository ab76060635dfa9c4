package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted join must be row-for-row identical to the plain join, and the
  * salt must actually spread a hot key across reducers.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin == plain inner join on real tables") {
    val orders = Tables.orders(spark, sf0001)
      .select($"o_custkey".as("k"), $"o_orderkey", $"o_totalprice")
    val cust = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("k"), $"c_name")
    val plain = orders.join(cust, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(orders, cust, "k", nSalts = 7)
    assert(salted.count() === plain.count())
    val cols = plain.columns.toIndexedSeq.map(col)
    assert(salted.select(cols: _*).exceptAll(plain).isEmpty &&
           plain.exceptAll(salted.select(cols: _*)).isEmpty)
  }

  test("hybridJoin == plain join when some keys are treated as hot") {
    val orders = Tables.orders(spark, sf0001)
      .select($"o_custkey".as("k"), $"o_orderkey")
    val cust = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("k"), $"c_name")
    val hot = orders.groupBy("k").count().orderBy($"count".desc)
      .limit(3).select("k").as[Long].collect().toSeq
    val plain = orders.join(cust, Seq("k"))
    val hybrid = SkewJoin.hybridJoin(orders, cust, "k", hot, nSalts = 5)
    assert(hybrid.count() === plain.count())
    assert(hybrid.select(plain.columns.toIndexedSeq.map(col): _*).exceptAll(plain).isEmpty)
  }

  test("salt spreads a pathological key across distinct salt values") {
    // one key, many distinct payloads → salts must not collapse to one value
    val skewed = (1 to 1000).map(i => (42L, s"payload_$i")).toDF("k", "v")
    val nDistinctSalts = skewed
      .withColumn("_salt", pmod(xxhash64($"v"), lit(7)).cast("int"))
      .select("_salt").distinct().count()
    assert(nDistinctSalts === 7)
  }
}

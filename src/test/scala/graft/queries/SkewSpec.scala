package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftSuite, SparkEntry}
import graft.core.Tables

/** Salting equivalence: the rewrites must be invisible in the results and
  * visible in the shuffle key. */
class SkewSpec extends GraftSuite {

  test("salted two-phase aggregation == direct aggregation") {
    val li = Tables(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
      .orderBy(col("key")).collect().toSeq

    val salted = Skew.saltedAgg(li, col("l_returnflag"),
        saltBy = col("l_orderkey"), numSalts = 8)(
      partial = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("pq")),
      combine = Seq(sum(col("pn")).as("n"), round(sum(col("pq")), 4).as("qty")))
      .orderBy(col("key")).collect().toSeq

    assert(salted === direct)
  }

  test("salted join == plain join, and joins on the composite (key, salt)") {
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    val plain = SparkEntry.queries("q12_inner_join")(spark, sf).collect().toSeq

    val joined = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey",
        saltBy = col("o_orderkey"), numSalts = 4)
      .select(col("o_orderkey"), col("c_name")).orderBy(col("o_orderkey"))
    assert(joined.collect().toSeq === plain)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt key absent from the join plan:\n$plan")
  }
}

package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed join elides exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    Layout.writeBucketed(o.select("o_custkey", "o_orderkey", "o_totalprice"),
      "b_orders", 4, Seq("o_custkey"))
    Layout.writeBucketed(c.select($"c_custkey".as("o_custkey"), $"c_name"),
      "b_cust", 4, Seq("o_custkey"))
    // disable broadcast so the planner actually uses the bucketed layout
    // (at real scale neither side broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "b_orders", "b_cust",
        Seq("o_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan must use the bucketed layout:\n$plan")
      assert(joined.count() == o.count()) // every order has a customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join returns exactly the plain-join rows") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey")
    val c = graft.Tables.load(spark, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_nationkey").collect().toSet
    val salted = Layout.saltedJoin(o, c, Seq("o_custkey"), "o_orderkey", 8)
      .select("o_orderkey", "c_nationkey").collect().toSet
    assert(salted == plain)
  }

  test("spark SQL passthrough over engine views") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sv-wh").toString
    val e = new graft.engine.Engine(spark, wh)
    e.execute("create database sv")
    e.execute("create table sv.t(sec int, tm timestamp, px double, primary key(sec, tm))")
    e.batchInsert("insert into sv.t values(?, ?, ?)",
      (0 until 100).map(i => Seq[Any](i % 3, i.toLong, i * 1.0)))
    val views = e.registerViews("sv")
    assert(views.contains("sv_t"))
    val agg = e.sparkSql(
      "SELECT sec, count(*) AS n, sum(px) AS s FROM sv_t GROUP BY sec ORDER BY sec")
      .collect()
    assert(agg.length == 3 && agg.map(_.getLong(1)).sum == 100)
  }
}

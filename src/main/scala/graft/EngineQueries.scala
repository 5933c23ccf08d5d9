package graft

import graft.engine.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Oracle-checked queries that exercise the opentick-compat [[Engine]]
  * end-to-end: dialect parse → strict WHERE resolution → PK-sorted
  * parquet scan → LWW upsert view → adj application.
  *
  * One warehouse is built per (session, sf dir): `ot.orders` imported
  * through the distributed PK-sorted writer, plus a bar/_adj_ pair
  * derived from `events` with power-of-two adjustment factors (products
  * of powers of two are bit-exact in any evaluation order, so the DuckDB
  * oracle can reproduce the engine's float64 results exactly).
  */
object EngineQueries {
  private val engines = TrieMap.empty[String, Engine]

  def forDir(spark: SparkSession, dir: String): Engine =
    engines.getOrElseUpdate(dir, {
      val wh = java.nio.file.Files.createTempDirectory("graft-ot-wh").toString
      val e = new Engine(spark, wh)
      e.execute("create database ot")
      val orders = Tables.load(spark, dir, "orders")
      e.importTable("ot", "orders", orders, Seq("o_custkey", "o_orderkey"))
      // bar table: view events, PK (sec, event_id, tm) — adj requires
      // first key int, last key timestamp (reference query.go:864-875)
      val ev = Tables.load(spark, dir, "events")
      val bar = ev.filter(col("event_type") === "view")
        .select(col("user_id").cast("int").as("sec"),
          col("event_id"),
          timestamp_micros(expr("ts div 1000")).as("tm"),
          col("value"))
      e.importTable("ot", "bar", bar, Seq("sec", "event_id", "tm"))
      // corporate actions from purchase events, exact power-of-two px
      val adjEv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").cast("int").as("sec"),
          timestamp_micros(expr("ts div 1000")).as("time"),
          when(pmod(col("event_id"), lit(3)) === 0, 0.5)
            .when(pmod(col("event_id"), lit(3)) === 1, 2.0)
            .otherwise(0.25).as("px"),
          lit(2.0).as("vol"))
      e.catalog.importData(e.catalog.getSchema("ot", "_adj_"), adjEv)
      e
    })

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ot_point_get",
      (s, dir) => {
        val e = forDir(s, dir)
        val k = Tables.load(s, dir, "orders")
          .filter(col("o_custkey") === 1L).agg(min("o_orderkey"))
          .head().getLong(0)
        e.execute(
          "select o_custkey, o_orderkey, o_totalprice, o_orderstatus from ot.orders where o_custkey=1 and o_orderkey=?",
          Seq(k))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus
              FROM orders
              WHERE o_custkey = 1 AND o_orderkey =
                (SELECT min(o_orderkey) FROM orders WHERE o_custkey = 1)""")),

    QueryDef(
      "ot_prefix_scan",
      (s, dir) => forDir(s, dir).execute(
        "select o_custkey, o_orderkey, o_totalprice from ot.orders where o_custkey=1"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = 1 ORDER BY o_custkey, o_orderkey""")),

    QueryDef(
      "ot_range_scan",
      (s, dir) => forDir(s, dir).execute(
        "select o_custkey, o_orderkey, o_totalprice from ot.orders where o_custkey=1 and o_orderkey>=? and o_orderkey<?",
        Seq(10L, 10000000L)),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = 1 AND o_orderkey >= 10
                AND o_orderkey < 10000000
              ORDER BY o_custkey, o_orderkey""")),

    QueryDef(
      "ot_reverse_limit",
      (s, dir) => forDir(s, dir).execute(
        "select o_custkey, o_orderkey, o_totalprice from ot.orders where o_custkey=1 limit -3"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = 1
              ORDER BY o_custkey DESC, o_orderkey DESC LIMIT 3""")),

    QueryDef(
      "ot_upsert",
      (s, dir) => {
        val e = forDir(s, dir)
        e.execute("create table if not exists ot.ups(a int, b int, v double, s text, primary key(a, b))")
        e.batchInsert("insert into ot.ups values(?, ?, ?, ?)",
          Seq(Seq(1, 1, 1.5, "x"), Seq(1, 2, 2.5, "y")))
        // whole-row overwrite: unset s becomes NULL (query.go:302)
        e.execute("insert into ot.ups(a, b, v) values(1, 2, 9.5)")
        e.execute("select * from ot.ups where a=1")
      },
      Some("""SELECT * FROM (VALUES (1, 1, 1.5, 'x'), (1, 2, 9.5, NULL))
              AS t(a, b, v, s) ORDER BY a, b""")),

    QueryDef(
      "ot_delete",
      (s, dir) => {
        val e = forDir(s, dir)
        e.execute("create table if not exists ot.del(a int, b int, v double, primary key(a, b))")
        e.batchInsert("insert into ot.del values(?, ?, ?)",
          (1 to 5).map(i => Seq[Any](1, i, i * 1.5)))
        e.execute("delete from ot.del where a=1 and b>=2 and b<=3")
        e.execute("select * from ot.del where a=1")
      },
      Some("""SELECT * FROM (VALUES (1, 1, 1.5), (1, 4, 6.0), (1, 5, 7.5))
              AS t(a, b, v) ORDER BY a, b""")),

    // the dialect as a first-class spark.sql surface: a session built
    // with GraftExtensions + spark.graft.warehouse runs opentick SQL
    // directly — no Engine.execute call in sight
    QueryDef(
      "ot_sql_dialect",
      (s, dir) => {
        val e = forDir(s, dir)
        GraftExtensions.register(e)
        val sql = GraftExtensions.sessionFor(s, e.warehouse)
        sql.sql("select o_custkey, o_orderkey, o_totalprice from ot.orders " +
          "where o_custkey=2 limit -5")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = 2
              ORDER BY o_custkey DESC, o_orderkey DESC LIMIT 5""")),

    QueryDef(
      "ot_adj_backward",
      (s, dir) => forDir(s, dir)
        .execute("select sec, event_id, tm, adj(value, true) from ot.bar")
        .withColumn("tm", expr("unix_micros(tm)")),
      Some("""WITH adj AS (
                SELECT CAST(user_id AS INT) AS sec, epoch_us(ts) AS tus,
                       CASE event_id % 3 WHEN 0 THEN 0.5 WHEN 1 THEN 2.0
                            ELSE 0.25 END AS px
                FROM events WHERE event_type = 'purchase'),
              bar AS (
                SELECT CAST(user_id AS INT) AS sec, event_id,
                       epoch_us(ts) AS tus, value
                FROM events WHERE event_type = 'view')
              SELECT b.sec, b.event_id, b.tus AS tm,
                     b.value * coalesce(
                       (SELECT product(1.0 / a.px) FROM adj a
                        WHERE a.sec = b.sec AND a.tus <= b.tus), 1.0) AS value
              FROM bar b ORDER BY b.sec, b.event_id, b.tus"""))
  )
}

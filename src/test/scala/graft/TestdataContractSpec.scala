package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-visible schema of every driver-generated table.
  *
  * Round 5 broke silently when the driver re-encoded `events.ts` from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP_MICROS/NTZ: 28 registered
  * queries died at analysis. This spec is the commit-time tripwire —
  * whatever physical encoding the testdata carries, [[Tables.load]]
  * must surface the contract below.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fieldTypes(name: String): Map[String, DataType] =
    Tables.load(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("all ten tables load") {
    Tables.all.foreach { t =>
      assert(Tables.load(spark, sf, t).limit(1).count() == 1, s"$t is empty")
    }
  }

  test("events.ts surfaces as LongType epoch-nanos regardless of physical encoding") {
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == LongType, s"ts read as ${ev.schema("ts").dataType}")
    // Plausible-instant check: epoch-nanos for any date between 2000 and
    // 2100 — catches a shim that yields micros (1000× too small) or a
    // double pass that yields 1000× too large.
    val Array(lo, hi) = ev.agg(min("ts"), max("ts")).as[(Long, Long)](
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .head() match { case (a, b) => Array(a, b) }
    val y2000 = 946684800L * 1000000000L
    val y2100 = 4102444800L * 1000000000L
    assert(lo >= y2000 && hi < y2100, s"ts range [$lo, $hi] is not epoch-nanos")
  }

  test("normalizeTs accepts both physical encodings") {
    import spark.implicits._
    // A raw long column passes through untouched…
    val asLong = Seq(1700000000123456789L).toDF("ts")
    assert(Tables.normalizeTs(asLong).head().getLong(0) == 1700000000123456789L)
    // …an NTZ micros timestamp is widened to nanos (UTC session)…
    val asNtz = Seq("2023-11-14 22:13:20.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(Tables.normalizeTs(asNtz).schema("ts").dataType == LongType)
    assert(Tables.normalizeTs(asNtz).head().getLong(0) == 1700000000123456000L)
    // …and so is a zoned timestamp.
    val asTs = Seq("2023-11-14 22:13:20.123456").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    assert(Tables.normalizeTs(asTs).head().getLong(0) == 1700000000123456000L)
  }

  test("tsMicros is integer-division by 1000") {
    import spark.implicits._
    val out = Seq(1700000000123456789L).toDF("ts")
      .select(Tables.tsMicros(col("ts"))).head().getLong(0)
    assert(out == 1700000000123456L)
  }

  test("core column contracts hold") {
    val ev = fieldTypes("events")
    assert(ev("event_id") == LongType && ev("user_id") == LongType)
    assert(ev("event_type") == StringType && ev("value") == DoubleType)
    val li = fieldTypes("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType)
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType).contains(li("l_shipdate")),
      s"l_shipdate read as ${li("l_shipdate")}")
    val ord = fieldTypes("orders")
    assert(ord("o_orderkey") == LongType && ord("o_totalprice") == DoubleType)
    val emb = fieldTypes("embeddings")
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true) ||
      emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding read as ${emb("embedding")}")
    val docs = fieldTypes("documents")
    assert(docs("doc_id") == LongType && docs("text") == StringType)
  }
}

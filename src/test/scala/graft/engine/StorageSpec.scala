package graft.engine

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Round-2 storage-layer semantics: deletion vectors (no-rewrite
  * DELETE), metadata-only column renames that survive later inserts,
  * the 1M-row batch guard, and the clean-table ordered read that keeps
  * Exchange/Sort out of compat SELECT plans.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val engine = {
    val wh = Files.createTempDirectory("graft-storage-wh").toString
    val e = new Engine(spark, wh)
    e.execute("create database s")
    e
  }

  private def dataFiles(tbl: String): Seq[(String, Long)] = {
    val d = java.nio.file.Paths.get(engine.warehouse, "s", tbl, "data")
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.getFileName.toString, Files.getLastModifiedTime(p).toMillis))
      .toSeq.sortBy(_._1)
  }

  test("delete writes deletion vectors and rewrites no data file") {
    engine.execute("create table s.dv(a int, b double, primary key(a))")
    // several batches = several data files
    for (i <- 1 to 5)
      engine.execute(s"insert into s.dv values($i, $i.5)")
    val before = dataFiles("dv")
    assert(before.length == 5)
    engine.execute("delete from s.dv where a=3")
    // no data file added, removed, or touched
    assert(dataFiles("dv") == before)
    assert(Files.isDirectory(
      java.nio.file.Paths.get(engine.warehouse, "s", "dv", "deletes")))
    val r = engine.execute("select * from s.dv").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 5))
    // re-insert after the delete: the newer version is visible again
    engine.execute("insert into s.dv values(3, 9.5)")
    assert(engine.execute("select * from s.dv where a=3").collect().toSeq ==
      Seq(Row(3, 9.5)))
  }

  test("time travel before a delete resurrects the rows") {
    engine.execute("create table s.tt(a int, b double, primary key(a))")
    engine.execute("insert into s.tt values(1, 1.5)")
    engine.execute("insert into s.tt values(2, 2.5)")
    val td = engine.catalog.getSchema("s", "tt")
    val beforeDelete = engine.catalog.writeVersion(td)
    engine.execute("delete from s.tt where a=1")
    assert(engine.execute("select * from s.tt").collect().toSeq ==
      Seq(Row(2, 2.5)))
    val asOf = engine.catalog.readTableAsOf(td, beforeDelete)
      .orderBy("a").collect().toSeq
    assert(asOf == Seq(Row(1, 1.5), Row(2, 2.5)))
  }

  test("compact folds deletion vectors away") {
    engine.execute("create table s.cf(a int, b double, primary key(a))")
    for (i <- 1 to 4) engine.execute(s"insert into s.cf values($i, $i.5)")
    engine.execute("delete from s.cf where a=2")
    val td = engine.catalog.getSchema("s", "cf")
    engine.catalog.compact(td)
    assert(!Files.isDirectory(
      java.nio.file.Paths.get(engine.warehouse, "s", "cf", "deletes")))
    assert(engine.execute("select * from s.cf").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 3, 4))
  }

  test("rename column then insert then read keeps all values aligned") {
    engine.execute("create table s.rn(a int, b double, c text, primary key(a))")
    engine.execute("insert into s.rn values(1, 1.5, 'one')")
    engine.execute("alter table s.rn rename column b to bb")
    // this insert lands in a file written AFTER the rename; both files
    // must read back under the same physical mapping
    engine.execute("insert into s.rn values(2, 2.5, 'two')")
    val r = engine.execute("select a, bb, c from s.rn").collect().toSeq
    assert(r == Seq(Row(1, 1.5, "one"), Row(2, 2.5, "two")))
    // delete through the renamed column's table, then read again
    engine.execute("delete from s.rn where a=1")
    assert(engine.execute("select a, bb, c from s.rn").collect().toSeq ==
      Seq(Row(2, 2.5, "two")))
  }

  test("batch insert of 1M+ rows is rejected (seq packing guard)") {
    engine.execute("create table s.big(a int, primary key(a))")
    val td = engine.catalog.getSchema("s", "big")
    val row = Seq[Any](1)
    val rows = Seq.fill(1000000)(row) // shared instance; no real memory
    val e = intercept[OtError](engine.catalog.appendRows(td, rows))
    assert(e.msg.contains("1000000"))
  }

  test("batch insert past the 10 MB byte bound is rejected (FDB analog)") {
    engine.execute("create table s.wide(a int, t text, primary key(a))")
    val td = engine.catalog.getSchema("s", "wide")
    val mb = "x" * 1048576 // 1 MiB of text per row (shared instance)
    val over = (0 until 11).map(i => Seq[Any](i, mb)) // ~11.5 MB estimated
    val e = intercept[OtError](engine.catalog.appendRows(td, over))
    assert(e.msg.contains("-byte batch bound"), e.msg)
    // a batch under the bound (and the reference's own 10k-row OHLCV
    // batches, ~0.7 MB) still flows
    engine.catalog.appendRows(td, (0 until 9).map(i => Seq[Any](i, mb)))
    assert(engine.execute("select a from s.wide").collect().length == 9)
  }

  test("clean-table full scan: no Exchange, no Sort, PK presentation order") {
    import spark.implicits._
    val shuffled = Seq(5, 2, 9, 1, 7, 3, 8, 4, 6, 10)
      .map(i => (i, i * 1.5)).toDF("k", "v")
    engine.importTable("s", "ord", shuffled, Seq("k"))
    val df = engine.execute("select * from s.ord")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan has Exchange:\n$plan")
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Sort "),
      s"plan has Sort:\n$plan")
    assert(df.collect().map(_.getInt(0)).toSeq == (1 to 10))
    // reverse presentation via negative limit, still no Exchange
    val rev = engine.execute("select * from s.ord limit -3")
    val rplan = rev.queryExecution.executedPlan.toString
    assert(!rplan.contains("Exchange"), s"reverse plan has Exchange:\n$rplan")
    assert(rev.collect().map(_.getInt(0)).toSeq == Seq(10, 9, 8))
    // an append dirties the table; results stay correct via the sort path
    engine.execute("insert into s.ord values(0, 0.5)")
    assert(engine.execute("select * from s.ord").collect()
      .map(_.getInt(0)).toSeq == (0 to 10))
  }

  test("a failed batch append commits nothing (staging + atomic rename)") {
    engine.execute("create table s.atom(k int, v double, primary key(k))")
    val td = engine.catalog.getSchema("s", "atom")
    engine.catalog.appendRows(td, Seq(Seq[Any](1, 1.5)))
    val dataDir = java.nio.file.Paths.get(engine.catalog.warehouse, "s",
      "atom", "data")
    def files = java.nio.file.Files.list(dataDir).toArray.map(_.toString)
    val before = files.toSet
    // a bad cell mid-batch: the write must fail WITHOUT publishing a
    // partial part file or leaking the staging file
    intercept[OtError](engine.catalog.appendRows(td,
      Seq(Seq[Any](2, 2.5), Seq[Any](3, new java.util.Date()))))
    assert(files.toSet == before, "failed append must leave no new file")
    assert(engine.execute("select * from s.atom").count() == 1)
  }

  test("ordered read plans O(1) in file count (many-file clean table)") {
    import spark.implicits._
    // import under a high shuffle-partition count -> ~200 range files,
    // the shape a 1000-executor compact produces
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val df = (1 to 2000).map(i => (i, i * 0.5)).toDF("k", "v")
      engine.importTable("s", "many", df, Seq("k"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    val dataDir = java.nio.file.Paths.get(engine.catalog.warehouse, "s",
      "many", "data")
    val nFiles = java.nio.file.Files.list(dataDir).filter(
      _.getFileName.toString.endsWith(".parquet")).count()
    assert(nFiles > 100, s"expected many files, got $nFiles")
    val out = engine.execute("select * from s.many")
    val plan = out.queryExecution.executedPlan.toString
    // one scan node regardless of file count: no per-file union chain,
    // no Exchange, no Sort
    assert(!plan.contains("Union"), s"plan has per-file Union:\n$plan")
    assert(!plan.contains("Exchange"), s"plan has Exchange:\n$plan")
    assert(plan.linesIterator.size < 12,
      s"plan must stay flat at $nFiles files:\n$plan")
    assert(out.collect().map(_.getInt(0)).toSeq == (1 to 2000))
    // reverse presentation across file boundaries
    assert(engine.execute("select * from s.many limit -5").collect()
      .map(_.getInt(0)).toSeq == Seq(2000, 1999, 1998, 1997, 1996))
    // pushed-down point/range predicates stay exact through the scan
    assert(engine.execute("select v from s.many where k=1234").collect()
      .map(_.getDouble(0)).toSeq == Seq(617.0))
    assert(engine.execute("select k from s.many where k>=1995 and k<1999")
      .collect().map(_.getInt(0)).toSeq == Seq(1995, 1996, 1997, 1998))
  }

  test("nanosecond PK fidelity: ns-distinct keys are distinct rows with exact bounds") {
    engine.execute("create table s.ns(sec int, tm timestamp, px double, primary key(sec, tm))")
    // three rows inside the SAME microsecond (t=5s + 1µs + {250,500,750}ns),
    // inserted via the reference's (sec, nsec) placeholder pairs
    for ((ns, px) <- Seq(250 -> 1.0, 500 -> 2.0, 750 -> 3.0))
      engine.execute("insert into s.ns values(1, ?, ?)",
        Seq(Seq(5L, 1000L + ns), px))
    // all three survive as distinct keys (µs truncation would LWW them
    // into one)
    val all = engine.execute("select * from s.ns where sec=1").collect()
    assert(all.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0))
    // ns-exact point get
    assert(engine.execute("select px from s.ns where sec=1 and tm=?",
      Seq(Seq(5L, 1500L))).collect().map(_.getDouble(0)).toSeq == Seq(2.0))
    // ns-exact range bounds: (1250, 1750] keeps the middle and upper
    val r = engine.execute(
      "select px from s.ns where sec=1 and tm>? and tm<=?",
      Seq(Seq(5L, 1250L), Seq(5L, 1750L))).collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(2.0, 3.0))
    // ns-exact upsert: overwriting the middle key touches only it
    engine.execute("insert into s.ns values(1, ?, ?)",
      Seq(Seq(5L, 1500L), 9.0))
    assert(engine.execute("select * from s.ns where sec=1").collect()
      .map(_.getDouble(2)).toSeq == Seq(1.0, 9.0, 3.0))
    // ns-exact delete removes exactly one of the µs-colliding keys
    engine.execute("delete from s.ns where sec=1 and tm=?",
      Seq(Seq(5L, 1500L)))
    assert(engine.execute("select * from s.ns where sec=1").collect()
      .map(_.getDouble(2)).toSeq == Seq(1.0, 3.0))
    // reverse presentation order respects the sub-µs ordering
    assert(engine.execute("select * from s.ns where sec=1 limit -2")
      .collect().map(_.getDouble(2)).toSeq == Seq(3.0, 1.0))
  }

  test("randomized op sequences match a model (LWW + DV + rename + compact)") {
    val rnd = new scala.util.Random(42)
    engine.execute("create table s.prop(k int, v double, w text, primary key(k))")
    var model = Map.empty[Int, (Double, String)]
    var colV = "v"
    var renameIdx = 0
    var snapshot: Option[(Long, Map[Int, (Double, String)])] = None
    def tdNow = engine.catalog.getSchema("s", "prop")
    for (step <- 1 to 40) {
      rnd.nextInt(10) match {
        case n if n <= 5 => // upsert (whole-row replace)
          val k = rnd.nextInt(8)
          val v = rnd.nextInt(100) / 2.0
          val w = "s" + rnd.nextInt(5)
          engine.execute(s"insert into s.prop(k, $colV, w) values($k, $v, '$w')")
          model += k -> (v, w)
        case 6 | 7 => // point or range delete (deletion vectors)
          if (rnd.nextBoolean()) {
            val k = rnd.nextInt(8)
            engine.execute(s"delete from s.prop where k=$k")
            model -= k
          } else {
            val lo = rnd.nextInt(8)
            val hi = lo + rnd.nextInt(4)
            engine.execute(s"delete from s.prop where k>=$lo and k<=$hi")
            model = model.filter { case (k, _) => k < lo || k > hi }
          }
        case 8 => // metadata-only column rename
          val nn = s"v$renameIdx"; renameIdx += 1
          engine.execute(s"alter table s.prop rename column $colV to $nn")
          colV = nn
        case 9 =>
          engine.catalog.compact(tdNow)
      }
      if (step == 20)
        snapshot = Some((engine.catalog.writeVersion(tdNow), model))
      if (step % 4 == 0 || step == 40) {
        val got = engine.execute("select * from s.prop").collect()
          .map(r => r.getInt(0) -> (r.getDouble(1), r.getString(2))).toMap
        assert(got == model, s"step $step: $got != $model")
      }
    }
    // time travel back to the mid-sequence snapshot (unless a later
    // compact folded history away — compaction keeps only the present)
    snapshot.foreach { case (ver, snap) =>
      val stillHasLog = engine.catalog.writeVersion(tdNow) > ver
      if (stillHasLog) {
        val got = engine.catalog.readTableAsOf(tdNow, ver).collect()
          .map(r => r.getInt(0) -> (r.getDouble(1), r.getString(2))).toMap
        // a compact between snapshot and now rewrites history at the
        // current state; only assert when the data dir still holds the
        // original seq range (detectable: asOf returns the snapshot)
        if (got.nonEmpty || snap.isEmpty) assert(got == snap || got == model,
          s"asOf($ver): $got matches neither snapshot nor present")
      }
    }
  }

  test("adj projection is codegen-native: no ScalaUDF in the plan") {
    engine.execute("insert into s._adj_ values(1, 3, 0.5, 2)")
    engine.execute("create table s.bar(a int, b timestamp, c double, primary key(a, b))")
    for (b <- Seq(0, 2, 4))
      engine.execute(s"insert into s.bar values(1, $b, 1.0)")
    val df = engine.execute("select b, adj(c) from s.bar where a=1")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"plan has a UDF node:\n$plan")
    val got = df.collect().map(r =>
      (r.getTimestamp(0).toInstant.getEpochSecond, r.getDouble(1))).toSeq
    assert(got == Seq((0L, 0.5), (2L, 0.5), (4L, 1.0)))
  }
}

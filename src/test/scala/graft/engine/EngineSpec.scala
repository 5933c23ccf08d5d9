package graft.engine

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ported resolver/DDL/e2e goldens from reference query_test.go — exact
  * error strings and result sets. Cited lines refer to /root/reference.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val engine = {
    val wh = Files.createTempDirectory("graft-wh").toString
    val e = new Engine(spark, wh)
    e.execute("create database test")
    e
  }

  private def err(sql: String, args: Seq[Any] = Nil): String =
    intercept[OtError](engine.execute(sql, args)).msg

  test("resolver error goldens (query_test.go:16-68)") {
    engine.execute("create table test.test(a int, b int, b2 boolean, c int, d double, e bigint, primary key(a, b, b2, c))")
    assert(err("select a, b, b from test.test where a=1") == "Duplicate column name b")
    assert(err("insert into test.test(a) values(1)") == "Some primary keys are missing: b, b2, c")
    assert(err("insert into test.test(a, a, c) values(1, 1, 1)") == "Duplicate column name a")
    assert(err("insert into test.test(a, a, c) values(1, 1)") == "Unmatched column names/values")
    // valid partial insert resolves (query_test.go:39-41)
    engine.execute("insert into test.test(a, b, b2, c, d) values(1, 1, false, 1, 1)")
    assert(err("delete from test.test where d=1") == "Invalid column d in where clause, only primary key can be used")
    assert(err("delete from test.test where a<2.2") == "Invalid float64 value (2.2) for \"a\" of Int")
    assert(err("delete from test.test where b2<true") == "Invalid operator (<) for \"b2\" of type Boolean")
    assert(err("delete from test.test where a=1 and a<1") == "a cannot be restricted by more than one relation if it includes an Equal")
    assert(err("delete from test.test where a<=1 and a<1") == "More than one restriction was found for the end bound on a")
    assert(err("delete from test.test where a>=1 and a>1") == "More than one restriction was found for the start bound on a")
    assert(err("delete from test.test where b=2") == "Cannot execute this query as it might involve data filtering and thus may have unpredictable performance")
    assert(err("delete from test.test where a<2 and b=2") == "Cannot execute this query as it might involve data filtering and thus may have unpredictable performance")
    // placeholders count (query_test.go:69-73)
    engine.execute("delete from test.test where a=2 and b=2 and b2=?", Seq(true))
  }

  test("DDL goldens (query_test.go:74-89)") {
    engine.execute("drop database test")
    assert(err("drop database test") == "Database test does not exist")
    assert(err("create table test.test(a int, primary key(a))") == "Database test does not exist")
    engine.execute("create database test")
    assert(err("drop table test.test") == "Table test.test does not exists")
    engine.execute("create table test.test(a int, b int, b2 boolean, c int, d double, e bigint, primary key(a, b, b2, c))")
    assert(err("create table test.test(a int, primary key(a))") == "Table test.test already exists")
    assert(err("create database test") == "Database test already exists")
    engine.execute("create database if not exists test")
    engine.execute("create table if not exists test.test(x int)")
    // schema DDL validation errors (schema_test.go:136-150 semantics)
    assert(err("create table test.t2(a int, a int, primary key(a))") == "Multiple definition of identifier a")
    assert(err("create table test.t2(a int, primary key(a, a))") == "Duplicate definition a referenced in PRIMARY KEY")
    assert(err("create table test.t2(a int, primary key(b))") == "Unknown definition b referenced in PRIMARY KEY")
    assert(err("create table test.t2(a int)") == "PRIMARY KEY not declared")
    assert(err("create table t2(a int, primary key(a))") == "No database name has been specified. USE a database name, or explicitly specify databasename.tablename")
  }

  test("placeholder arity and coercion goldens (query_test.go:90-97)") {
    engine.execute("drop table test.test")
    engine.execute("create table test.test(a int, b int, b2 boolean, c int, d double, e bigint, primary key(a, b, b2, c))")
    assert(err("insert into test.test(a, b, b2, c, d) values(1, 1, ?, ?, 1)", Seq(1)) == "Expected 2 arguments, got 1")
    assert(err("insert into test.test(a, b, b2, c, d) values(1, 1, ?, ?, 1)", Seq(1, 1)) == "Invalid int value (1) for \"b2\" of Boolean")
    assert(err("insert into test.test(a, b, b2, c, d) values(1, 1, ?, ?, 1)", Seq(true, true)) == "Invalid bool value (true) for \"c\" of Int")
    assert(err("insert into test.test(a, b2) values(1, ?)", Seq(true)) == "Some primary keys are missing: b, c")
    engine.execute("select * from test.test where a=1 and b=2 and b2=? and c<?", Seq(true, 1))
    engine.execute("delete from test.test where a=1 and b=2 and b2=? and c<?", Seq(true, 1))
  }

  test("end-to-end point/range/reverse/delete (query_test.go:102-138)") {
    engine.execute("drop table test.test")
    engine.execute("create table test.test(a int, b int, b2 boolean, c int, d double, e bigint, primary key(a, b, b2, c))")
    engine.execute("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 42, 2.2, 102)")
    engine.execute("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 41, 2.2, 104)")
    engine.execute("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 39, 2.2, 105)")
    val r1 = engine.execute("select * from test.test where a=2 and b=1 and b2=? and c=?", Seq(true, 42)).collect()
    assert(r1.toSeq == Seq(Row(2, 1, true, 42, 2.2, 102L)))
    val r2 = engine.execute("select * from test.test where a=2 and b=1 and b2=true").collect()
    assert(r2.length == 3)
    assert(r2(0) == Row(2, 1, true, 39, 2.2, 105L))
    assert(engine.execute("select * from test.test").collect().length == 3)
    val r3 = engine.execute("select * from test.test where a=2 and b=1 and b2=true limit -2").collect()
    assert(r3.length == 2)
    assert(r3(0) == Row(2, 1, true, 42, 2.2, 102L))
    // rename round-trip (query_test.go:121-128)
    engine.execute("alter table test.test rename to test2")
    assert(err("select * from test.test where a=2 and b=1 and b2=true and c>39 and c<42") == "Table test.test does not exists")
    val r4 = engine.execute("select * from test.test2 where a=2 and b=1 and b2=true and c>39 and c<42").collect()
    assert(r4.toSeq == Seq(Row(2, 1, true, 41, 2.2, 104L)))
    engine.execute("alter table test.test2 rename to test")
    val r5 = engine.execute("select * from test.test where a=2 and b=1 and b2=true and c>=39 and c<=42").collect()
    assert(r5.length == 3)
    assert(r5(0).getInt(3) == 39 && r5(2).getInt(3) == 42)
    engine.execute("delete from test.test where a=2 and b=1 and b2=true and c>=39 and c<=42")
    assert(engine.execute("select * from test.test where a=2 and b=1 and b2=true").collect().isEmpty)
  }

  test("upsert replaces whole row (server_test.go:96-99 semantics)") {
    engine.execute("create table if not exists test.ups(a int, b double, c double, primary key(a))")
    engine.execute("insert into test.ups values(1, 1.5, 2.5)")
    engine.execute("insert into test.ups(a, b) values(1, 9.5)")
    val r = engine.execute("select * from test.ups where a=1").collect()
    // whole-row overwrite: c becomes NULL, not merged
    assert(r.toSeq == Seq(Row(1, 9.5, null)))
  }

  test("saturating integer clamps (query.go:710-728)") {
    engine.execute("create table if not exists test.clamp(a int, t tinyint, s smallint, primary key(a))")
    engine.execute("insert into test.clamp values(1, 300, 70000)")
    engine.execute("insert into test.clamp values(2, -300, -70000)")
    val r = engine.execute("select * from test.clamp").collect()
    assert(r(0) == Row(1, 127.toByte, 32767.toShort))
    assert(r(1) == Row(2, (-128).toByte, (-32768).toShort))
  }

  test("rename column keeps data (schema_test.go:167-172 semantics)") {
    engine.execute("create table if not exists test.rc(a int, b double, primary key(a))")
    engine.execute("insert into test.rc values(7, 3.5)")
    engine.execute("alter table test.rc rename column b to bb")
    val df = engine.execute("select a, bb from test.rc where a=7")
    assert(df.columns.toSeq == Seq("a", "bb"))
    assert(df.collect().toSeq == Seq(Row(7, 3.5)))
    assert(intercept[OtError](
      engine.execute("alter table test.rc rename column zz to q")).msg ==
      "Column zz does not exist")
    assert(intercept[OtError](
      engine.execute("alter table test.rc rename column a to bb")).msg ==
      "Column bb already exists")
  }

  test("user perm parsing (user.go:29-61, query_test.go:139-151)") {
    engine.loadUsers()
    engine.execute("insert into _meta_.user values('__a', 'x', true, 'a=write;b.x=read')")
    engine.execute("insert into _meta_.user values('__b', 'y', false, 'a=read;b.x=write')")
    engine.loadUsers()
    assert(intercept[OtError](engine.login("__a", "not-the-pw")).msg ==
      "Invalid password")
    assert(intercept[OtError](engine.login("nobody", "x")).msg ==
      "Invalid user name")
    val ua = User("__a", "", isAdmin = true, Map("a" -> Perm.Writable,
      "b.x" -> Perm.Readable))
    assert(engine.getPerm("anything", "t", Some(ua)) == Perm.Writable)
    val ub = User("__b", "", isAdmin = false, Map("a" -> Perm.Readable,
      "b.x" -> Perm.Writable))
    assert(engine.getPerm("a", "", Some(ub)) == Perm.Readable)
    assert(engine.getPerm("b", "x", Some(ub)) == Perm.Writable)
    assert(engine.getPerm("b", "y", Some(ub)) == Perm.No)
  }

  test("permission map parsing and enforcement") {
    engine.loadUsers()
    engine.execute("insert into _meta_.user values('__c', ?, false, 'test=read')",
      Seq(Engine.sha1("pw")))
    engine.loadUsers()
    val u = engine.login("__c", "pw")
    assert(!u.isAdmin)
    assert(engine.getPerm("test", "", Some(u)) == Perm.Readable)
    // read allowed
    engine.execute("select * from test.test", user = Some(u))
    // write denied
    assert(intercept[OtError](engine.execute(
      "insert into test.test(a, b, b2, c) values(1, 1, true, 1)",
      user = Some(u))).msg == "No permisssion")
    assert(intercept[OtError](engine.execute(
      "create database zz", user = Some(u))).msg == "No permisssion")
  }

  test("batch insert + select with limit") {
    engine.execute("create table if not exists test.batch(sec int, tm timestamp, px double, primary key(sec, tm))")
    val rows = (0 until 100).map(i => Seq[Any](1, i.toLong, i * 1.5))
    engine.batchInsert("insert into test.batch values(?, ?, ?)", rows)
    val r = engine.execute("select * from test.batch where sec=1 and tm>=10 and tm<20")
    assert(r.count() == 10)
    val top = engine.execute("select tm, px from test.batch where sec=1 limit -3").collect()
    assert(top.map(_.getDouble(1)).toSeq == Seq(99 * 1.5, 98 * 1.5, 97 * 1.5))
  }

  test("meta commands: list databases/tables, schema, use (server.go:441-496)") {
    engine.execute("create database if not exists metatest")
    assert(engine.listDatabases().contains("metatest"))
    assert(engine.listTables("metatest") == Seq("_adj_"))
    engine.execute("create table metatest.mt(a int, b text, primary key(a))")
    assert(engine.listTables("metatest") == Seq("_adj_", "mt"))
    val td = engine.tableSchemaOf("metatest", "mt")
    assert(td.keys.map(_.name) == Seq("a"))
    assert(td.cols.map(c => (c.name, c.tpe.name)) ==
      Seq(("a", "Int"), ("b", "Text")))
    engine.use("metatest")
    assert(engine.currentDatabase == "metatest")
    engine.execute("insert into mt values(1, 'x')") // unqualified via use
    assert(engine.execute("select * from mt where a=1").count() == 1)
    assert(intercept[OtError](engine.use("nosuchdb")).msg ==
      "Database nosuchdb does not exist")
  }

  test("timestamp input forms: int seconds, [sec,nsec] pair, RFC-3339 (query.go:754-779)") {
    engine.execute("create table if not exists test.tsf(a int, t timestamp, v float, primary key(a, t))")
    engine.execute("insert into test.tsf values(1, 100, 1.5)")
    engine.execute("insert into test.tsf values(2, ?, 2.5)",
      Seq(Seq(200L, 123456789L))) // nsec truncated to micros
    engine.execute("insert into test.tsf values(3, '2020-01-02T03:04:05Z', 3.5)")
    engine.execute("insert into test.tsf values(4, ?, 4.5)",
      Seq(java.time.Instant.ofEpochSecond(400L)))
    val rows = engine.execute("select * from test.tsf").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).toInstant, r.getFloat(2)))
    assert(rows(0) == ((1, java.time.Instant.ofEpochSecond(100L), 1.5f)))
    assert(rows(1)._2 == java.time.Instant.ofEpochSecond(200L, 123456000L))
    assert(rows(2)._2 == java.time.Instant.parse("2020-01-02T03:04:05Z"))
    assert(rows(3)._2 == java.time.Instant.ofEpochSecond(400L))
    // float column stored as float32 (query.go:745-746)
    assert(rows.map(_._3).toSeq == Seq(1.5f, 2.5f, 3.5f, 4.5f))
    // bad timestamp input → reference error shape
    val e1 = intercept[OtError](engine.execute(
      "insert into test.tsf values(5, 'not-a-time', 1)"))
    assert(e1.msg == "Invalid string value (not-a-time) for \"t\" of Timestamp")
    val e2 = intercept[OtError](engine.execute(
      "insert into test.tsf values(5, true, 1)"))
    assert(e2.msg == "Invalid bool value (true) for \"t\" of Timestamp")
  }

  test("compacted/imported tables read without the LWW window; appends dirty it again") {
    engine.execute("create table if not exists test.cln(k int, v double, primary key(k))")
    engine.batchInsert("insert into test.cln values(?, ?)",
      (0 until 20).map(i => Seq[Any](i % 10, i * 1.0)))
    val td = engine.tableSchemaOf("test", "cln")
    val dirty = engine.catalog.readTable(td)
    assert(dirty.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(dirty.count() == 10)
    engine.catalog.compact(td)
    val clean = engine.catalog.readTable(td)
    assert(!clean.queryExecution.optimizedPlan.toString.contains("row_number"),
      "clean table must skip the LWW window")
    assert(clean.orderBy("k").collect().map(_.getDouble(1)).toSeq ==
      (10 until 20).map(_ * 1.0)) // later writes won
    engine.execute("insert into test.cln values(3, 99.0)")
    val redirty = engine.catalog.readTable(td)
    assert(redirty.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(redirty.filter("k = 3").head().getDouble(1) == 99.0)
  }

  test("time travel: readTableAsOf reconstructs earlier versions") {
    engine.execute("create table if not exists test.tt(k int, v double, primary key(k))")
    val td = engine.tableSchemaOf("test", "tt")
    engine.execute("insert into test.tt values(1, 1.0)")
    val v1 = engine.catalog.writeVersion(td)
    engine.execute("insert into test.tt values(1, 2.0)")
    engine.execute("insert into test.tt values(2, 5.0)")
    val now = engine.catalog.readTable(td).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(now == Seq((1, 2.0), (2, 5.0)))
    val past = engine.catalog.readTableAsOf(td, v1).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(past == Seq((1, 1.0)))
    assert(engine.catalog.readTableAsOf(td, 0).count() == 0)
  }

  test("cyclic column renames keep values attached to the right columns") {
    // a→c, b→a, c→b swaps the two value columns; a chained rename would
    // pass through a duplicate-name state and corrupt both
    engine.execute("create table if not exists test.cyc(k int, a double, " +
      "b double, primary key(k))")
    engine.execute("insert into test.cyc values(1, 10.0, 20.0)")
    engine.execute("alter table test.cyc rename column a to c")
    engine.execute("alter table test.cyc rename column b to a")
    engine.execute("alter table test.cyc rename column c to b")
    val df = engine.execute("select k, b, a from test.cyc where k=1")
    assert(df.columns.toSeq == Seq("k", "b", "a"))
    assert(df.collect().toSeq == Seq(Row(1, 10.0, 20.0)),
      "b must carry old a's value and a old b's value")
    // a later insert through the swapped mapping still lines up: the
    // positional values follow the table's CURRENT column order (k, b, a)
    engine.execute("insert into test.cyc(k, a, b) values(2, 1.5, 2.5)")
    assert(engine.execute("select b, a from test.cyc where k=2")
      .collect().toSeq == Seq(Row(2.5, 1.5)))
  }

  test("rename column rejects reserved storage names (like CREATE does)") {
    engine.execute("create table if not exists test.rsv(k int, v double, " +
      "primary key(k))")
    assert(err("alter table test.rsv rename column v to v__ns") ==
      "Column name v__ns is reserved")
    assert(err("alter table test.rsv rename column v to __seq") ==
      "Column name __seq is reserved")
  }

  test("response cache never crosses users (permission fingerprint in key)") {
    engine.execute("create table if not exists test.cache_perm(k int, " +
      "v double, primary key(k))")
    engine.execute("insert into test.cache_perm values(1, 5.0)")
    val sql = "select * from test.cache_perm where k=1"
    // admin (no user) populates the cache...
    assert(engine.executeCached(sql, ttlMs = 60000).count() == 1)
    // ...an unprivileged user with the same sql must hit ITS OWN
    // permission check, not the admin's cached rows
    val nobody = User("nobody", "", isAdmin = false, Map.empty)
    assert(intercept[OtError](
      engine.executeCached(sql, ttlMs = 60000, user = Some(nobody))).msg ==
      "No permisssion")
  }
}

package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Cross-language wire conformance: the stdlib-only Python client
  * (bindings/python/graftclient.py, mirroring the reference
  * bindings/python/opentick/client.py API shape) speaks the JSON frame
  * protocol to a live [[GraftServer]] from a subprocess — DDL, prepared
  * batch insert, selects with (sec, nsec) nanosecond timestamps, error
  * strings, and meta commands all round-trip through a non-JVM peer.
  */
class PyClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def python3: Option[String] =
    Seq("/usr/bin/python3", "/usr/local/bin/python3").find(p =>
      Files.isExecutable(Paths.get(p)))

  private def roundTrip(protocol: String): Unit = {
    assume(python3.nonEmpty, "python3 not installed on this machine")
    val wh = Files.createTempDirectory("graft-py-wh").toString
    val engine = new Engine(spark, wh)
    val server = new GraftServer(engine, port = 0, idleTimeoutMs = 200)
    val script = Files.createTempFile("graft-py", ".py")
    try {
      val driver =
        """import json, sys
          |sys.path.insert(0, sys.argv[1])
          |import graftclient as gc
          |c = gc.connect('127.0.0.1', int(sys.argv[2]),
          |               protocol=sys.argv[3])
          |c.execute('create database pydb')
          |c.use('pydb')
          |c.execute('create table pydb.t(sec int, tm timestamp, px double,'
          |          ' note text, primary key(sec, tm))')
          |c.batch_insert('insert into pydb.t values(?, ?, ?, ?)', [
          |    [1, (7, 123), 1.5, 'a'],   # 7s + 123ns: sub-microsecond
          |    [1, (7, 456000), 2.5, 'b'],
          |    [2, (9, 0), 9.0, 'c']])
          |rows = c.execute('select * from pydb.t where sec=1')
          |print(json.dumps(rows, default=repr))
          |print(json.dumps(
          |    c.execute('select px from pydb.t where sec=1 and tm=?',
          |              [(7, 123)])))
          |print(json.dumps(sorted(c.list_databases())))
          |print(json.dumps(c.schema('t')))
          |import datetime
          |pre = datetime.datetime(1969, 12, 31, 23, 59, 59, 500000,
          |                        tzinfo=datetime.timezone.utc)
          |c.execute('insert into pydb.t values(?, ?, ?, ?)',
          |          [3, pre, 0.5, 'pre-epoch'])
          |print(json.dumps(
          |    c.execute('select note from pydb.t where sec=3 and tm=?',
          |              [pre])))
          |try:
          |    c.execute('select * from pydb.nope')
          |    print('NO-ERROR')
          |except gc.Error as e:
          |    print('ERR:' + str(e))
          |parts = gc.split_range(0, 9, 3)
          |pid = c.prepare('insert into pydb.r values(?, ?)')
          |c.execute('create table pydb.r(k int, v double, primary key(k))')
          |c.batch_insert('insert into pydb.r values(?, ?)',
          |               [[i, i * 0.5] for i in range(10)])
          |print(json.dumps(c.execute_ranges(
          |    'select k from pydb.r where k>=? and k<=?', parts)))
          |print(json.dumps(c.execute_chunked(
          |    'select k from pydb.r where k>=? and k<=?', [0, 9],
          |    chunk_rows=3)))
          |c.reload_users()   # creates _meta_.user (local admin)
          |c.create_user('alice', 'pw1')
          |c.update_user('alice', perm={'pydb': 'read'})
          |print(json.dumps({u[0]: u[3] for u in c.list_users()}['alice']))
          |c2 = gc.connect('127.0.0.1', int(sys.argv[2]),
          |                protocol=sys.argv[3])
          |c2.login('alice', 'pw1')
          |print('LOGIN-OK')
          |c2.close()
          |c.delete_user('alice')
          |c3 = gc.connect('127.0.0.1', int(sys.argv[2]),
          |                protocol=sys.argv[3])
          |try:
          |    c3.login('alice', 'pw1')
          |    print('NO-ERR')
          |except gc.Error as e:
          |    print('ERR2:' + str(e))
          |c3.close()
          |c.close()
          |""".stripMargin
      Files.write(script, driver.getBytes(StandardCharsets.UTF_8))
      val repoBindings = Paths.get(System.getProperty("user.dir"),
        "bindings", "python").toString
      val proc = new ProcessBuilder(python3.get, script.toString,
        repoBindings, server.boundPort.toString, protocol)
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      assert(proc.waitFor() == 0, s"python client failed:\n$out")
      val lines = out.trim.linesIterator.toSeq
      // select * rows: ns timestamp surfaces as an exact (sec, nsec)
      // tuple, µs-divisible one as a datetime repr
      assert(lines(0).contains("[7, 123]") && lines(0).contains("1.5"))
      assert(lines(0).contains("datetime.datetime(1970, 1, 1, 0, 0, 7, 456"))
      // ns-exact point get through a (sec, nsec) placeholder
      assert(lines(1) == "[[1.5]]")
      assert(lines(2).contains("\"pydb\""))
      // schema meta: (keys, values) with (name, type) pairs
      assert(lines(3) == """[[["sec", "Int"], ["tm", "Timestamp"]], [["px", "Double"], ["note", "Text"]]]""")
      // pre-epoch fractional-second timestamp: truncation toward zero
      // would shift it a second forward and miss the key
      assert(lines(4) == """[["pre-epoch"]]""")
      assert(lines(5) == "ERR:Table pydb.nope does not exists")
      // scatter-gather over split ranges: junction dedup, full coverage
      assert(lines(6) == "[[0], [1], [2], [3], [4], [5], [6], [7], [8], [9]]")
      // chunked SELECT: 10 rows in 3-row frames reassemble in order
      assert(lines(7) == "[[0], [1], [2], [3], [4], [5], [6], [7], [8], [9]]")
      // user management sugar: create/update/list/login/delete
      assert(lines(8) == "\"pydb=read\"")
      assert(lines(9) == "LOGIN-OK")
      assert(lines(10) == "ERR2:Unknown username")
    } finally {
      Files.deleteIfExists(script)
      server.stop()
    }
  }

  test("python stdlib client round-trips the wire protocol (json)") {
    roundTrip("json")
  }

  test("python BSON codec interoperates with the Scala BSON codec") {
    // two INDEPENDENT hand-implementations of the public BSON spec
    // agreeing across the wire, both directions, including nanosecond
    // timestamp pairs
    roundTrip("bson")
  }
}

package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Cross-language wire conformance #2: the single-header C++17 client
  * (bindings/cpp/graftclient.hpp, mirroring the reference
  * bindings/cpp/include/opentick.h API shape) is compiled with the
  * system g++ and driven as a subprocess against a live
  * [[GraftServer]] — DDL, prepared batch insert with (sec, nsec)
  * timestamps, selects, meta commands, error strings, and idle
  * heartbeat servicing all round-trip through a native peer.
  */
class CppClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def gpp: Option[String] =
    Seq("/usr/bin/g++", "/usr/local/bin/g++").find(p =>
      Files.isExecutable(Paths.get(p)))

  private val driver =
    """#include "graftclient.hpp"
      |#include <chrono>
      |#include <iostream>
      |#include <thread>
      |int main(int argc, char** argv) {
      |  std::cout << std::unitbuf;
      |  using graft::Timestamp;
      |  using graft::Value;
      |  auto c = graft::Connection::Create(argv[1], std::atoi(argv[2]));
      |  c->Execute("create database cppdb");
      |  c->Use("cppdb");
      |  c->Execute("create table cppdb.t(sec int, tm timestamp, px double,"
      |             " note text, primary key(sec, tm))");
      |  c->BatchInsert("insert into cppdb.t values(?, ?, ?, ?)", {
      |      {int64_t(1), Timestamp{7, 123}, 1.5, std::string("a")},
      |      {int64_t(1), Timestamp{7, 456000}, 2.5, std::string("b")},
      |      {int64_t(2), Timestamp{9, 0}, 9.0, std::string("c")}});
      |  auto rows = c->Execute("select * from cppdb.t where sec=1");
      |  std::cout << "N1=" << rows.size() << "\n";
      |  // ns-exact point get through a Timestamp placeholder
      |  auto px = c->Execute("select px from cppdb.t where sec=1 and tm=?",
      |                       {Timestamp{7, 123}});
      |  std::cout << "PX=" << std::get<double>(px[0][0]) << "\n";
      |  // timestamps come back as (sec, nsec) with nothing truncated
      |  auto tm = c->Execute("select tm, note from cppdb.t where sec=1");
      |  for (auto& r : tm) {
      |    auto t = std::get<Timestamp>(r[0]);
      |    std::cout << "TM=" << t.sec << "." << t.nsec << ":"
      |              << std::get<std::string>(r[1]) << "\n";
      |  }
      |  bool has = false;
      |  for (auto& db : c->ListDatabases()) has |= db == "cppdb";
      |  std::cout << "HASDB=" << has << "\n";
      |  auto sch = c->Schema("t");
      |  std::cout << "KEYS=";
      |  for (auto& k : sch.keys) std::cout << k.first << "," << k.second << ";";
      |  std::cout << "\n";
      |  try {
      |    c->Execute("select * from cppdb.nope");
      |    std::cout << "NO-ERROR\n";
      |  } catch (const graft::Error& e) {
      |    std::cout << "ERR=" << e.what() << "\n";
      |  }
      |  // idle past the server heartbeat interval: queued 'H' probes
      |  // must be consumed and answered before the next reply
      |  std::this_thread::sleep_for(std::chrono::milliseconds(700));
      |  auto n2 = c->Execute("select * from cppdb.t where sec=2");
      |  std::cout << "N2=" << n2.size() << "\n";
      |  // chunked SELECT: 12 rows in 5-row frames reassemble in order
      |  c->Execute("create table cppdb.r(k int, v double,"
      |             " primary key(k))");
      |  {
      |    graft::Argss rows;
      |    for (int i = 0; i < 12; ++i)
      |      rows.push_back({int64_t(i), i * 0.5});
      |    c->BatchInsert("insert into cppdb.r values(?, ?)", rows);
      |  }
      |  auto ch = c->ExecuteChunked(
      |      "select k from cppdb.r where k>=? and k<=?",
      |      {int64_t(0), int64_t(11)}, 5);
      |  std::cout << "CHUNK=" << ch.size() << ":"
      |            << std::get<int64_t>(ch.front()[0]) << ".."
      |            << std::get<int64_t>(ch.back()[0]) << "\n";
      |  std::cout << "DONE\n";
      |  return 0;
      |}
      |""".stripMargin

  test("C++ client round-trips DDL, batch insert, ns timestamps, meta, errors") {
    assume(gpp.nonEmpty, "g++ not installed on this machine")
    val wh = Files.createTempDirectory("graft-cpp-wh").toString
    val engine = new Engine(spark, wh)
    val server = new GraftServer(engine, port = 0, idleTimeoutMs = 200)
    val dir = Files.createTempDirectory("graft-cpp")
    try {
      val src = dir.resolve("driver.cpp")
      Files.write(src, driver.getBytes(StandardCharsets.UTF_8))
      val bin = dir.resolve("driver").toString
      val hpp = Paths.get("bindings/cpp").toAbsolutePath.toString
      val compile = new ProcessBuilder(gpp.get, "-std=c++17", "-O0",
        "-I", hpp, src.toString, "-o", bin)
        .redirectErrorStream(true).start()
      val compileOut = new String(compile.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      assert(compile.waitFor() == 0, s"g++ failed:\n$compileOut")
      val run = new ProcessBuilder(bin, "127.0.0.1", server.boundPort.toString)
        .redirectErrorStream(true).start()
      val out = new String(run.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      assert(run.waitFor() == 0, s"driver failed:\n$out")
      val lines = out.linesIterator.toSeq
      assert(lines.contains("N1=2"), out)
      assert(lines.contains("PX=1.5"), out)
      assert(lines.contains("TM=7.123:a"), out)
      assert(lines.contains("TM=7.456000:b"), out)
      assert(lines.contains("HASDB=1"), out)
      assert(lines.contains("KEYS=sec,Int;tm,Timestamp;"), out)
      assert(lines.exists(_.startsWith("ERR=")), out)
      assert(!lines.contains("NO-ERROR"), out)
      assert(lines.contains("N2=1"), out)
      assert(lines.contains("CHUNK=12:0..11"), out)
      assert(lines.contains("DONE"), out)
    } finally {
      server.stop()
    }
  }
}

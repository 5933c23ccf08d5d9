package graft.engine

import Ast._
import org.scalatest.funsuite.AnyFunSuite

/** Parser shape goldens (reference parser_test.go:10-118). */
class ParserSpec extends AnyFunSuite {
  test("select with adj func, range conds, negative limit (parser_test.go:10)") {
    val s = Parser.parse(
      "select a, adj(b) from test where a > 1.2 and b < 2 limit -2")
      .asInstanceOf[Select]
    assert(s.cols.get == Seq(SelectCol("a", None, Nil),
      SelectCol("b", Some("adj"), Nil)))
    assert(s.table == TableName(None, "test"))
    assert(s.where == Seq(Condition("a", ">", FloatV(1.2)),
      Condition("b", "<", IntV(2))))
    assert(s.limit.contains(-2L))
  }

  test("insert with trailing-dot float and placeholder (parser_test.go:11)") {
    val s = Parser.parse("INSERT into x(x, y) values(1., ?)")
      .asInstanceOf[Insert]
    assert(s.table == TableName(None, "x"))
    assert(s.cols == Seq("x", "y"))
    // "1." fails int parse, becomes float (parser.go:38-47)
    assert(s.values == Seq(FloatV(1.0), Placeholder))
  }

  test("select star and db-qualified names") {
    val s = Parser.parse("select * from db1.t1 where a=1 limit 5")
      .asInstanceOf[Select]
    assert(s.cols.isEmpty)
    assert(s.table == TableName(Some("db1"), "t1"))
  }

  test("adj function variants with bool param") {
    val s = Parser.parse("select adj_px(a), adj_vol(b, true), adj(c, false) from t")
      .asInstanceOf[Select]
    assert(s.cols.get == Seq(
      SelectCol("a", Some("adj_px"), Nil),
      SelectCol("b", Some("adj_vol"), Seq(BoolV(true))),
      SelectCol("c", Some("adj"), Seq(BoolV(false)))))
  }

  test("DDL parse accept (parser_test.go:99-118)") {
    val c = Parser.parse(
      "create table if not exists d.t(a int, b timestamp, primary key(a, b))")
      .asInstanceOf[CreateTable]
    assert(c.ifNotExists && c.table == TableName(Some("d"), "t"))
    assert(c.cols == Seq("a" -> "INT", "b" -> "TIMESTAMP"))
    assert(c.keys == Seq("a", "b"))
    assert(Parser.parse("drop database xy") == DropDatabase("xy"))
    assert(Parser.parse("alter table t rename to t2") ==
      RenameTable(TableName(None, "t"), "t2"))
    assert(Parser.parse("alter table d.t rename column a to b") ==
      RenameColumn(TableName(Some("d"), "t"), "a", "b"))
  }

  test("DDL parse reject") {
    assertThrows[OtError](Parser.parse("create table t(a int) garbage"))
    assertThrows[OtError](Parser.parse("select from t"))
    assertThrows[OtError](Parser.parse("insert into t values()"))
    assertThrows[OtError](Parser.parse("select a from t where a ! 1"))
  }

  test("strings, booleans, scientific numbers") {
    val s = Parser.parse(
      """select a from t where a='x' and b="y" and c=true and d=1.5e-3""")
      .asInstanceOf[Select]
    assert(s.where == Seq(
      Condition("a", "=", StringV("x")),
      Condition("b", "=", StringV("y")),
      Condition("c", "=", BoolV(true)),
      Condition("d", "=", FloatV(1.5e-3))))
  }
}

package graft

import graft.engine.OtError
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The opentick dialect as a first-class `spark.sql` surface: a session
  * built with [[GraftExtensions]] runs the EngineSpec e2e goldens
  * (reference query_test.go:102-138) directly through `spark.sql`,
  * delegates everything the opentick grammar can't express to Spark's
  * own parser, and exposes `cosine_to_query` as a SQL function.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val parent = SparkTestSession.spark
  private lazy val wh = Files.createTempDirectory("graft-ext-wh").toString
  private lazy val sql = GraftExtensions.sessionFor(parent, wh)

  test("e2e dialect goldens through spark.sql (query_test.go:102-138)") {
    sql.sql("create database test")
    sql.sql("create table test.test(a int, b int, b2 boolean, c int, d double, e bigint, primary key(a, b, b2, c))")
    sql.sql("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 42, 2.2, 102)")
    sql.sql("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 41, 2.2, 104)")
    sql.sql("insert into test.test(a, b, b2, c, d, e) values(2, 1, true, 39, 2.2, 105)")
    val r1 = sql.sql("select * from test.test where a=2 and b=1 and b2=true and c=42").collect()
    assert(r1.toSeq == Seq(Row(2, 1, true, 42, 2.2, 102L)))
    val r2 = sql.sql("select * from test.test where a=2 and b=1 and b2=true").collect()
    assert(r2.length == 3 && r2(0) == Row(2, 1, true, 39, 2.2, 105L))
    val r3 = sql.sql("select * from test.test where a=2 and b=1 and b2=true limit -2").collect()
    assert(r3.length == 2 && r3(0) == Row(2, 1, true, 42, 2.2, 102L))
    sql.sql("alter table test.test rename to test2")
    val r4 = sql.sql("select * from test.test2 where a=2 and b=1 and b2=true and c>39 and c<42").collect()
    assert(r4.toSeq == Seq(Row(2, 1, true, 41, 2.2, 104L)))
    sql.sql("alter table test.test2 rename to test")
    sql.sql("delete from test.test where a=2 and b=1 and b2=true and c>=39 and c<=42")
    assert(sql.sql("select * from test.test where a=2 and b=1 and b2=true").collect().isEmpty)
  }

  test("engine error goldens surface through spark.sql") {
    sql.sql("create table if not exists test.errs(a int, b int, primary key(a, b))")
    assert(intercept[OtError](
      sql.sql("select * from test.errs where b=2")).msg ==
      "Cannot execute this query as it might involve data filtering and " +
        "thus may have unpredictable performance")
    assert(intercept[OtError](
      sql.sql("select a, a from test.errs where a=1")).msg ==
      "Duplicate column name a")
  }

  test("non-dialect SQL delegates to Spark's parser untouched") {
    assert(sql.sql("select 1 as one").collect().toSeq == Seq(Row(1)))
    sql.range(5).createOrReplaceTempView("r5")
    // GROUP BY — inexpressible in the opentick grammar, must delegate
    assert(sql.sql("select count(*) as n from r5 group by 1=1").collect()
      .head.getLong(0) == 5L)
    // a dialect-parseable SELECT on a table the engine doesn't own
    // delegates too (temp view wins)
    sql.sql("select * from r5").collect()
  }

  test("cosine_to_query is a session SQL function with codegen") {
    val r = sql.sql(
      "select cosine_to_query(cast(array(3.0, 4.0) as array<double>), " +
        "cast(array(3.0, 4.0) as array<double>)) as c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
    val e = intercept[Exception](sql.sql(
      "select cosine_to_query(cast(array(1.0) as array<double>), rand())"))
    assert(e.getMessage.contains("constant array") ||
      e.getMessage.contains("unsupported"))
  }

  test("hex52 is a session SQL function matching the portable SQL form") {
    val r = sql.sql("select hex52('alpha') as h").collect().head.getLong(0)
    // bit-identical to the first 13 md5 hex nibbles (the Hex52Impl spec)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r == java.lang.Long.parseLong(md5hex.take(13), 16))
    intercept[Exception](sql.sql("select hex52('a', 'b')"))
  }

  test("parent session is untouched by the dialect") {
    // the parent has no warehouse conf: dialect syntax stays a parse error
    intercept[Exception](parent.sql("select * from test.test limit -2"))
  }
}

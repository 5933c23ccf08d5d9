package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import java.nio.file.Files

/** Property tests (SURVEY.md §5 rebuild plan): the PK-prefix WHERE rule,
  * splitRange coverage, saturating clamps, LWW upsert replay.
  */
class PropertySpec extends AnyFunSuite {
  private def check(prop: Prop, trials: Int = 50): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  private lazy val spark = SparkTestSession.spark
  private lazy val engine = {
    val e = new Engine(spark, Files.createTempDirectory("graft-prop").toString)
    e.execute("create database p")
    e.execute("create table p.t4(a int, b int, c int, d int, v double, primary key(a, b, c, d))")
    e
  }

  private val keyNames = Vector("a", "b", "c", "d")
  private val ops = Seq("=", "<", "<=", ">", ">=")

  private val condGen: Gen[(Int, String, Int)] = for {
    col <- Gen.choose(0, 3)
    op <- Gen.oneOf(ops)
    v <- Gen.choose(-5, 5)
  } yield (col, op, v)

  /** Independent model of the reference's acceptance rule
    * (query.go:579-669): per-column relation limits, then a contiguous
    * equality prefix with at most a trailing range.
    */
  private def modelAccepts(conds: List[(Int, String, Int)]): Boolean = {
    val equal = Array.fill(4)(false)
    val start = Array.fill(4)(false)
    val end = Array.fill(4)(false)
    for ((c, op, _) <- conds) {
      if (equal(c)) return false
      op match {
        case "=" =>
          if (start(c) || end(c)) return false
          equal(c) = true
        case "<" | "<=" =>
          if (end(c)) return false
          end(c) = true
        case ">" | ">=" =>
          if (start(c)) return false
          start(c) = true
      }
    }
    var sawEmpty = false
    var sawRange = false
    for (i <- 0 until 4) {
      val nonEmpty = equal(i) || start(i) || end(i)
      if (nonEmpty && (sawEmpty || sawRange)) return false
      if (!nonEmpty) sawEmpty = true
      if (start(i) || end(i)) sawRange = true
    }
    true
  }

  test("PK-prefix WHERE rule matches the model on random conjunctions") {
    check(Prop.forAll(Gen.listOf(condGen).map(_.take(5))) { conds =>
      conds.isEmpty || {
        val where = conds.map { case (c, op, v) =>
          s"${keyNames(c)}$op$v"
        }.mkString(" and ")
        val sql = s"select * from p.t4 where $where"
        val accepted = try { engine.execute(sql); true }
        catch { case _: OtError => false }
        accepted == modelAccepts(conds)
      }
    }, trials = 100)
  }

  test("splitRange covers [a,b] contiguously, ends exactly at b") {
    check(Prop.forAll(Gen.choose(-100000L, 100000L),
      Gen.choose(1L, 100000L), Gen.choose(2, 50)) {
      (a: Long, span: Long, n: Int) =>
        val b = a + span
        val parts = Client.splitRange(a, b, n)
        parts.length == n &&
          parts.head._1 == a && parts.last._2 == b &&
          parts.sliding(2).forall {
            case Seq(p, q) => p._2 == q._1
            case _ => true
          } && parts.forall { case (lo, hi) => lo <= hi }
    })
  }

  test("integer coercion saturates at type bounds") {
    val tiny = ColDef("t", OtType.TinyInt)
    val small = ColDef("s", OtType.SmallInt)
    val int = ColDef("i", OtType.Int)
    check(Prop.forAll { v: Long =>
      val t = Coerce.validateValue(tiny, v).asInstanceOf[Byte]
      val s = Coerce.validateValue(small, v).asInstanceOf[Short]
      val i = Coerce.validateValue(int, v).asInstanceOf[Int]
      t == math.max(math.min(v, 127L), -128L).toByte &&
        s == math.max(math.min(v, 32767L), -32768L).toShort &&
        i == math.max(math.min(v, Int.MaxValue.toLong),
          Int.MinValue.toLong).toInt
    })
  }

  test("LWW upsert replay equals a Map fold") {
    val trials = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0.0, 9.0)))
    var i = 0
    check(Prop.forAll(trials) { writes =>
      i += 1
      val tbl = s"lww$i"
      engine.execute(s"create table if not exists p.$tbl(k int, v double, primary key(k))")
      engine.batchInsert(s"insert into p.$tbl values(?, ?)",
        writes.map { case (k, v) => Seq[Any](k, v) })
      val expect = writes.foldLeft(Map.empty[Int, Double]) {
        case (m, (k, v)) => m + (k -> v)
      }
      val got = engine.execute(s"select * from p.$tbl").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      engine.execute(s"drop table p.$tbl")
      got == expect
    }, trials = 5)
  }
}

package graft.engine

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled tokenizer + recursive-descent parser for the reference's
  * closed SQL dialect (grammar: reference parser.go:9-183). Supports:
  * SELECT / INSERT / DELETE / CREATE / DROP / ALTER, conjunctive WHERE
  * with `= < <= > >=`, `?` placeholders, `limit ±N`, and the
  * `adj/adj_px/adj_vol` select functions.
  */
object Parser {
  private val Keywords = Set(
    "TIMESTAMP", "DATABASE", "BOOLEAN", "PRIMARY", "SMALLINT", "TINYINT",
    "BIGINT", "DOUBLE", "SELECT", "INSERT", "VALUES", "COLUMN", "CREATE",
    "DELETE", "RENAME", "FLOAT", "WHERE", "LIMIT", "TABLE", "ALTER", "FALSE",
    "TEXT", "FROM", "TYPE", "DROP", "TRUE", "TO", "INTO", "ADD", "AND", "KEY",
    "INT", "IF", "NOT", "EXISTS")
  private val Funcs = Set("ADJ_PX", "ADJ_VOL", "ADJ")
  private val TypeKeywords = Set("BIGINT", "TINYINT", "SMALLINT", "INT",
    "DOUBLE", "FLOAT", "TIMESTAMP", "BOOLEAN", "TEXT")

  sealed trait Tok
  private final case class KW(s: String) extends Tok
  private final case class Fn(s: String) extends Tok
  private final case class Ident(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Op(s: String) extends Tok

  private def tokenize(sql: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val j = sql.indexOf(c, i + 1)
        if (j < 0) throw OtError(s"Unterminated string at offset $i")
        out += Str(sql.substring(i + 1, j))
        i = j + 1
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < n && (sql(j).isLetterOrDigit || sql(j) == '_')) j += 1
        val w = sql.substring(i, j)
        val up = w.toUpperCase
        if (Funcs.contains(up)) out += Fn(up)
        else if (Keywords.contains(up)) out += KW(up)
        else out += Ident(w)
        i = j
      } else if (c.isDigit ||
          (c == '-' && i + 1 < n && sql(i + 1).isDigit)) {
        // number: -?\d+\.?\d*([eE][-+]?\d+)? (reference parser.go:14)
        var j = i + 1
        while (j < n && sql(j).isDigit) j += 1
        if (j < n && sql(j) == '.') { j += 1; while (j < n && sql(j).isDigit) j += 1 }
        if (j < n && (sql(j) == 'e' || sql(j) == 'E')) {
          var k = j + 1
          if (k < n && (sql(k) == '+' || sql(k) == '-')) k += 1
          if (k < n && sql(k).isDigit) {
            while (k < n && sql(k).isDigit) k += 1
            j = k
          }
        }
        out += Num(sql.substring(i, j))
        i = j
      } else if (c == '<' || c == '>') {
        if (i + 1 < n && sql(i + 1) == '=') { out += Op(s"$c="); i += 2 }
        else { out += Op(c.toString); i += 1 }
      } else if ("-+*/%,.()=?".indexOf(c) >= 0) {
        out += Op(c.toString); i += 1
      } else throw OtError(s"Unexpected character '$c' at offset $i")
    }
    out.toVector
  }

  final private class Cursor(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      val t = peek.getOrElse(throw OtError("Unexpected end of statement"))
      pos += 1; t
    }
    def expectKw(kw: String): Unit = next() match {
      case KW(`kw`) => ()
      case other => throw OtError(s"Expected $kw, got $other")
    }
    def expectOp(op: String): Unit = next() match {
      case Op(`op`) => ()
      case other => throw OtError(s"Expected '$op', got $other")
    }
    def ident(): String = next() match {
      case Ident(s) => s
      case other => throw OtError(s"Expected identifier, got $other")
    }
    def atKw(kw: String): Boolean = peek.contains(KW(kw))
    def atOp(op: String): Boolean = peek.contains(Op(op))
    def tryOp(op: String): Boolean = { if (atOp(op)) { pos += 1; true } else false }
    def tryKw(kw: String): Boolean = { if (atKw(kw)) { pos += 1; true } else false }
    def done: Boolean = pos >= toks.length
  }

  def parse(sql: String): Stmt = {
    val c = new Cursor(tokenize(sql))
    val stmt = c.next() match {
      case KW("SELECT") => parseSelect(c)
      case KW("INSERT") => parseInsert(c)
      case KW("DELETE") => parseDelete(c)
      case KW("CREATE") => parseCreate(c)
      case KW("DROP") => parseDrop(c)
      case KW("ALTER") => parseAlter(c)
      case other => throw OtError(s"Unexpected token $other")
    }
    if (!c.done) throw OtError(s"Trailing tokens after statement")
    stmt
  }

  private def parseTableName(c: Cursor): TableName = {
    val a = c.ident()
    if (c.tryOp(".")) TableName(Some(a), c.ident()) else TableName(None, a)
  }

  private def parseValue(c: Cursor): Value = c.next() match {
    case Num(s) =>
      // ParseInt first, fall back to float (reference parser.go:38-47)
      try IntV(java.lang.Long.parseLong(s))
      catch { case _: NumberFormatException => FloatV(s.toDouble) }
    case Str(s) => StringV(s)
    case Op("?") => Placeholder
    case KW("TRUE") => BoolV(true)
    case KW("FALSE") => BoolV(false)
    case other => throw OtError(s"Expected value, got $other")
  }

  private def parseSelect(c: Cursor): Stmt = {
    val cols: Option[Seq[SelectCol]] =
      if (c.tryOp("*")) None
      else {
        val lst = ArrayBuffer.empty[SelectCol]
        do {
          c.next() match {
            case Ident(name) => lst += SelectCol(name, None, Nil)
            case Fn(fn) =>
              c.expectOp("(")
              val colName = c.ident()
              val params = ArrayBuffer.empty[Value]
              while (c.tryOp(",")) params += parseValue(c)
              c.expectOp(")")
              lst += SelectCol(colName, Some(fn.toLowerCase), params.toSeq)
            case other => throw OtError(s"Expected column, got $other")
          }
        } while (c.tryOp(","))
        Some(lst.toSeq)
      }
    c.expectKw("FROM")
    val first = c.ident()
    // table-valued function: `from fn(arg, ...)` — the operator
    // extension surface. Projection is plain columns only (the adj
    // select-function family applies to PK tables, not TVF output);
    // WHERE conjunctions resolve against the function's output schema
    // at execute; positive LIMIT only (checked at execute)
    if (c.atOp("(")) {
      c.expectOp("(")
      val fnCols = cols.map(_.map { sc =>
        if (sc.func.isDefined)
          throw OtError(
            "Table functions support plain column projection only")
        sc.name
      })
      val fnArgs = ArrayBuffer.empty[Value]
      if (!c.tryOp(")")) {
        do fnArgs += parseValue(c) while (c.tryOp(","))
        c.expectOp(")")
      }
      val where = if (c.tryKw("WHERE")) parseWhere(c) else Nil
      val limit = parseLimit(c)
      return SelectFn(first.toLowerCase, fnArgs.toSeq, fnCols, where,
        limit)
    }
    val tbl =
      if (c.tryOp(".")) TableName(Some(first), c.ident())
      else TableName(None, first)
    val where = if (c.tryKw("WHERE")) parseWhere(c) else Nil
    Select(cols, tbl, where, parseLimit(c))
  }

  private def parseLimit(c: Cursor): Option[Long] =
    if (c.tryKw("LIMIT")) Some(c.next() match {
      case Num(s) => java.lang.Long.parseLong(s)
      case other => throw OtError(s"Expected number after LIMIT, got $other")
    }) else None

  private def parseWhere(c: Cursor): Seq[Condition] = {
    val out = ArrayBuffer.empty[Condition]
    do {
      val lhs = c.ident()
      val op = c.next() match {
        case Op(o) if Set("=", "<", "<=", ">", ">=").contains(o) => o
        case other => throw OtError(s"Expected comparison operator, got $other")
      }
      out += Condition(lhs, op, parseValue(c))
    } while (c.tryKw("AND"))
    out.toSeq
  }

  private def parseInsert(c: Cursor): Insert = {
    c.expectKw("INTO")
    val tbl = parseTableName(c)
    val cols = ArrayBuffer.empty[String]
    if (c.tryOp("(")) {
      do cols += c.ident() while (c.tryOp(","))
      c.expectOp(")")
    }
    c.expectKw("VALUES")
    c.expectOp("(")
    val vals = ArrayBuffer.empty[Value]
    do vals += parseValue(c) while (c.tryOp(","))
    c.expectOp(")")
    Insert(tbl, cols.toSeq, vals.toSeq)
  }

  private def parseDelete(c: Cursor): Delete = {
    c.expectKw("FROM")
    val tbl = parseTableName(c)
    val where = if (c.tryKw("WHERE")) parseWhere(c) else Nil
    Delete(tbl, where)
  }

  private def parseCreate(c: Cursor): Stmt = c.next() match {
    case KW("DATABASE") =>
      val ine = parseIfNotExists(c)
      CreateDatabase(ine, c.ident())
    case KW("TABLE") =>
      val ine = parseIfNotExists(c)
      val tbl = parseTableName(c)
      c.expectOp("(")
      val cols = ArrayBuffer.empty[(String, String)]
      var keys: Seq[String] = null
      do {
        if (c.tryKw("PRIMARY")) {
          c.expectKw("KEY")
          c.expectOp("(")
          val ks = ArrayBuffer.empty[String]
          do ks += c.ident() while (c.tryOp(","))
          c.expectOp(")")
          // multiple PRIMARY KEY clauses caught in DDL validation, keep last
          if (keys != null) throw OtError("Duplicate PRIMARY KEY")
          keys = ks.toSeq
        } else {
          val name = c.ident()
          val tpe = c.next() match {
            case KW(k) if TypeKeywords.contains(k) => k
            case other => throw OtError(s"Expected type, got $other")
          }
          cols += ((name, tpe))
        }
      } while (c.tryOp(","))
      c.expectOp(")")
      CreateTable(ine, tbl, cols.toSeq, if (keys == null) Nil else keys)
    case other => throw OtError(s"Expected TABLE or DATABASE, got $other")
  }

  private def parseIfNotExists(c: Cursor): Boolean = {
    if (c.tryKw("IF")) { c.expectKw("NOT"); c.expectKw("EXISTS"); true }
    else false
  }

  private def parseDrop(c: Cursor): Stmt = c.next() match {
    case KW("TABLE") => DropTable(parseTableName(c))
    case KW("DATABASE") => DropDatabase(c.ident())
    case other => throw OtError(s"Expected TABLE or DATABASE, got $other")
  }

  private def parseAlter(c: Cursor): Stmt = {
    c.expectKw("TABLE")
    val tbl = parseTableName(c)
    c.expectKw("RENAME")
    if (c.tryKw("COLUMN")) {
      val from = c.ident()
      c.expectKw("TO")
      RenameColumn(tbl, from, c.ident())
    } else {
      c.expectKw("TO")
      RenameTable(tbl, c.ident())
    }
  }
}

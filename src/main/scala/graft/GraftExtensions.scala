package graft

import graft.engine.{Ast, Engine, Parser => OtParser}
import graft.functions.CosineToQuery
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** Session-level integration: makes the opentick dialect, the native
  * as-of strategy, and `cosine_to_query` first-class on any
  * SparkSession built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions()(_))   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .config("spark.graft.warehouse", "/path/to/warehouse")
  * }}}
  *
  * after which `spark.sql("select * from db.t where a=1 limit -2")` runs
  * through the compat engine directly (reference server.go:119-171 runs
  * these over TCP; here the session IS the server surface).
  *
  * Dialect interception is opt-in and conservative:
  *  - nothing is intercepted unless `spark.graft.warehouse` is set;
  *  - a statement is routed to the engine only when it parses under the
  *    opentick grammar AND (for DML) its target table exists in the
  *    graft catalog — everything else, including every piece of regular
  *    Spark SQL the opentick grammar cannot express (joins, GROUP BY,
  *    subqueries, …), falls through to Spark's own parser;
  *  - DDL that parses under the opentick grammar (CREATE TABLE with
  *    `primary key(...)`, `alter table … rename …`, CREATE/DROP
  *    DATABASE) is routed to the engine. Use a session without the
  *    warehouse conf for Spark-native database DDL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new GraftParser(session, delegate))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction(GraftExtensions.cosineToQueryFunction)
    ext.injectFunction(GraftExtensions.hex52Function)
    ext.injectFunction(GraftExtensions.cosinePairFunction)
    // same rule Tables.configure registers post-hoc: ts-range filters
    // over the derived epoch-nanos column must prune parquet scans
    ext.injectOptimizerRule(_ => graft.plans.NanoTsFilterPushdown)
  }
}

object GraftExtensions {
  val WarehouseConf = "spark.graft.warehouse"

  private val engines = TrieMap.empty[String, Engine]

  /** One engine per warehouse path (shared across sessions — the engine
    * state is the on-disk catalog plus small caches).
    */
  def engineFor(spark: SparkSession, warehouse: String): Engine =
    engines.getOrElseUpdate(warehouse, new Engine(spark, warehouse))

  /** Pre-seed the registry with an existing engine, so a dialect session
    * built over the same warehouse shares its state/caches.
    */
  def register(e: Engine): Unit = engines.putIfAbsent(e.warehouse, e)

  private val extSessions = TrieMap.empty[String, SparkSession]

  /** A sibling SparkSession over `parent`'s SparkContext with this
    * extension installed and the dialect bound to `warehouse` — the way
    * to get a dialect-enabled session next to an already-running one
    * (extensions only apply at session construction, so the default
    * session can't be retrofitted).
    */
  def sessionFor(parent: SparkSession, warehouse: String): SparkSession =
    extSessions.getOrElseUpdate(warehouse, this.synchronized {
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      try {
        val s = SparkSession.builder()
          .withExtensions(new GraftExtensions()(_))
          .config(WarehouseConf, warehouse)
          .getOrCreate()
        // runtime confs don't carry over from the parent session
        s.conf.set("spark.sql.shuffle.partitions",
          parent.conf.get("spark.sql.shuffle.partitions"))
        Tables.configure(s)
        s
      } finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    })

  /** `cosine_to_query(vec, array(...))` as a session SQL function: the
    * second argument must fold to a constant array, which becomes the
    * codegen'd query vector of [[CosineToQuery]].
    */
  val cosineToQueryFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_to_query"),
    new ExpressionInfo(classOf[CosineToQuery].getName, "cosine_to_query"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "cosine_to_query(vec, const_array) takes exactly 2 arguments")
      val q = exprs(1) match {
        case e if e.foldable => (e.eval(), e.dataType) match {
          case (a: ArrayData, ArrayType(DoubleType, _)) => a.toDoubleArray()
          case (a: ArrayData, ArrayType(FloatType, _)) =>
            a.toFloatArray().map(_.toDouble)
          case (a: ArrayData, ArrayType(IntegerType, _)) =>
            a.toIntArray().map(_.toDouble)
          case (a: ArrayData, ArrayType(LongType, _)) =>
            a.toLongArray().map(_.toDouble)
          case other => throw new IllegalArgumentException(
            s"cosine_to_query: unsupported query vector type ${other._2}")
        }
        case _ => throw new IllegalArgumentException(
          "cosine_to_query: the query vector must be a constant array")
      }
      CosineToQuery(exprs.head, q)
    })

  /** `hex52(str)` as a session SQL function: the portable 52-bit
    * md5-prefix hash (bit-identical to the 13-term substring SQL form
    * any engine can replay — [[graft.operators.Sketch.hex52Sql]]),
    * compiled as the native codegen expression [[graft.functions.Hex52]].
    * The hash behind the KMV sketch and the hashed-feature classifier.
    */
  val hex52Function: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hex52"),
    new ExpressionInfo(classOf[graft.functions.Hex52].getName, "hex52"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "hex52(str) takes exactly 1 argument")
      graft.functions.Hex52(exprs.head)
    })

  /** `cosine_pair(a, b)` as a session SQL function: exact pairwise
    * cosine of two vector COLUMNS (neither constant), compiled as the
    * native codegen expression [[graft.functions.CosinePair]] — the
    * verify primitive of k-NN graphs and embedding near-dup joins.
    */
  val cosinePairFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_pair"),
    new ExpressionInfo(classOf[graft.functions.CosinePair].getName,
      "cosine_pair"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "cosine_pair(a, b) takes exactly 2 arguments")
      graft.functions.CosinePair(exprs(0), exprs(1))
    })
}

/** Executes one opentick DDL/DML statement through the engine when the
  * surrounding `spark.sql(...)` call runs its command phase.
  */
case class GraftCommand(sql: String, warehouse: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftExtensions.engineFor(session, warehouse).execute(sql)
    Nil
  }
}

/** Parser interceptor: opentick-dialect statements route to the engine,
  * everything else delegates (see [[GraftExtensions]] for the rules).
  */
class GraftParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // read lazily per statement — touching session state inside the
  // injectParser builder would recurse into the under-construction
  // sessionState
  private def warehouse: Option[String] = {
    val wh = session.conf.get(GraftExtensions.WarehouseConf, "")
    if (wh.isEmpty) None else Some(wh)
  }

  private def engine(wh: String): Engine =
    GraftExtensions.engineFor(session, wh)

  private def targetExists(wh: String, t: Ast.TableName): Boolean = {
    val e = engine(wh)
    val db = t.db.getOrElse(e.currentDatabase)
    db.nonEmpty && e.catalog.hasDatabase(db) && e.catalog.hasTable(db, t.table)
  }

  override def parsePlan(sqlText: String): LogicalPlan = {
    warehouse match {
      case None => delegate.parsePlan(sqlText)
      case Some(wh) =>
        val stmt =
          try Some(OtParser.parse(sqlText))
          catch { case _: Exception => None }
        stmt match {
          case Some(s: Ast.Select) if targetExists(wh, s.table) =>
            org.apache.spark.sql.GraftSql.logicalPlan(
              engine(wh).execute(sqlText))
          case Some(s: Ast.Insert) if targetExists(wh, s.table) =>
            GraftCommand(sqlText, wh)
          case Some(s: Ast.Delete) if targetExists(wh, s.table) =>
            GraftCommand(sqlText, wh)
          case Some(_: Ast.CreateDatabase | _: Ast.CreateTable |
              _: Ast.DropDatabase | _: Ast.DropTable |
              _: Ast.RenameTable | _: Ast.RenameColumn) =>
            GraftCommand(sqlText, wh)
          case _ => delegate.parsePlan(sqlText)
        }
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

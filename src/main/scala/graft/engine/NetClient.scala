package graft.engine

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, Future, Promise}
import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Async TCP client SDK for [[GraftServer]] (reference
  * client/opentick.go): pipelined requests with ticket-keyed futures,
  * heartbeat replies, and automatic reconnect that replays login/use
  * state — the client-side half of SURVEY §2.8's heartbeat/reconnect.
  *
  * Select results come back as rows of plain values; timestamp cells
  * travel as [epochSeconds, nanos] pairs and are decoded to
  * `java.time.Instant` (the reference client materializes time.Time the
  * same way).
  */
final class NetClient(host: String, port: Int,
    syncTimeout: FiniteDuration = 30.seconds, protocol: String = "json") {
  require(protocol == "json" || protocol == "bson",
    s"unknown protocol $protocol")

  private def enc(doc: Map[String, Any]): Array[Byte] =
    if (protocol == "json") Wire.encode(doc) else Bson.encode(doc)
  private def dec(body: Array[Byte]): Map[String, Any] =
    if (protocol == "json") Wire.decode(body) else Bson.decode(body)
  private val tickets = new AtomicInteger(0)
  private val pending = TrieMap.empty[Int, Promise[Any]]
  // rows accumulated from chunked-response frames ({"2": 1} = more
  // follows), completed by the ticket's final frame
  private val partial =
    TrieMap.empty[Int, scala.collection.mutable.ArrayBuffer[Any]]
  @volatile private var sock: Socket = _
  @volatile private var out: DataOutputStream = _
  @volatile private var alive = false
  // replayed on reconnect
  @volatile private var loginCreds: Option[(String, String)] = None
  @volatile private var usedDb: Option[String] = None

  connect()

  private def connect(): Unit = synchronized {
    sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    out = new DataOutputStream(sock.getOutputStream)
    val in = new DataInputStream(sock.getInputStream)
    alive = true
    // BSON is the negotiated default (server.go:287-291); only JSON
    // mode announces itself
    if (protocol == "json")
      Wire.writeFrame(out, "protocol=json".getBytes(StandardCharsets.UTF_8))
    val reader = new Thread(() => readLoop(in), s"graft-client-read-$port")
    reader.setDaemon(true)
    reader.start()
  }

  private def readLoop(in: DataInputStream): Unit = {
    try {
      while (true) {
        val body = Wire.readFrame(in)
        if (body.length == 1 && body(0) == 'H'.toByte)
          // server idle-timeout heartbeat: answer with an empty frame
          Wire.writeFrame(out, Array.emptyByteArray)
        else if (body.nonEmpty) {
          val doc = dec(body)
          val ticket = doc.get("0") match {
            case Some(i: Int) => i
            case Some(l: Long) => l.toInt
            case _ => -1
          }
          val more = doc.get("2").exists {
            case i: Int => i > 0
            case l: Long => l > 0
            case _ => false
          }
          if (more)
            // non-final chunk: buffer, the ticket's future stays pending
            doc.getOrElse("1", null) match {
              case rows: Seq[_] =>
                partial.getOrElseUpdate(ticket,
                  scala.collection.mutable.ArrayBuffer.empty) ++= rows
              case _ => ()
            }
          else {
            val res = (partial.remove(ticket), doc.getOrElse("1", null)) match {
              // an error final frame voids the buffered chunks — the
              // scan failed mid-stream and the prefix is not the result
              case (Some(_), err: String) => err
              case (Some(buf), rows: Seq[_]) => buf.toSeq ++ rows
              // protocol sends rows / error / null on the final frame;
              // anything else is unreachable — keep the buffered prefix
              // (total match, no MatchError on a malformed peer)
              case (Some(buf), _) => buf.toSeq
              case (None, r) => r
            }
            pending.remove(ticket).foreach(_.success(res))
          }
        }
      }
    } catch {
      case NonFatal(e) =>
        alive = false
        val err = OtError("Connection lost: " + e.getMessage)
        partial.clear()
        pending.keys.toSeq.foreach(k =>
          pending.remove(k).foreach(_.tryFailure(err)))
    }
  }

  /** Re-dial and replay session state (login + use). */
  private def reconnect(): Unit = synchronized {
    if (alive) return
    try sock.close() catch { case NonFatal(_) => }
    connect()
    loginCreds.foreach { case (u, p) => syncCall("login", s"$u $p") }
    usedDb.foreach(db => syncCall("use", db))
  }

  private def call(cmd: String, sqlOrId: Any,
      args: Seq[Any] = null, useCache: Boolean = false,
      chunkRows: Int = 0): Future[Any] = {
    val ticket = tickets.incrementAndGet()
    val p = Promise[Any]()
    pending.put(ticket, p)
    val doc = Map[String, Any]("0" -> ticket, "1" -> cmd, "2" -> sqlOrId) ++
      Option(args).map("3" -> _) ++
      (if (useCache) Seq("4" -> 1) else Nil) ++
      (if (chunkRows > 0) Seq("5" -> chunkRows) else Nil)
    val bytes = enc(doc)
    try {
      if (!alive) reconnect()
      Wire.writeFrame(out, bytes)
    } catch {
      case NonFatal(_) =>
        // one transparent retry over a fresh connection
        alive = false
        reconnect()
        Wire.writeFrame(out, bytes)
    }
    p.future
  }

  /** Error-string results become failed futures (OtError). */
  private def checked(f: Future[Any]): Future[Any] = {
    implicit val ec = scala.concurrent.ExecutionContext.global
    f.flatMap {
      case err: String => Future.failed(OtError(err))
      case ok => Future.successful(ok)
    }
  }

  private def syncCall(cmd: String, sqlOrId: Any,
      args: Seq[Any] = null, useCache: Boolean = false): Any =
    Await.result(checked(call(cmd, sqlOrId, args, useCache)), syncTimeout)

  private def toRows(v: Any): Seq[Seq[Any]] = v match {
    case null => Nil
    case rows: Seq[_] => rows.map {
      case r: Seq[_] => r.map {
        case Seq(sec: Long, nsec: Long) =>
          java.time.Instant.ofEpochSecond(sec, nsec)
        case Seq(sec: Int, nsec: Int) =>
          java.time.Instant.ofEpochSecond(sec.toLong, nsec.toLong)
        case Seq(sec: Long, nsec: Int) =>
          java.time.Instant.ofEpochSecond(sec, nsec.toLong)
        case Seq(sec: Int, nsec: Long) =>
          java.time.Instant.ofEpochSecond(sec.toLong, nsec)
        case cell => cell
      }
      case other => Seq(other)
    }
    case other => Seq(Seq(other))
  }

  // ── public API ──

  def login(user: String, password: String): Unit = {
    syncCall("login", s"$user $password")
    loginCreds = Some((user, password))
  }

  def use(db: String): Unit = {
    syncCall("use", db)
    usedDb = Some(db)
  }

  /** Async statement execution; rows for selects, Nil otherwise. */
  def executeAsync(sql: String, args: Seq[Any] = Nil): Future[Seq[Seq[Any]]] = {
    implicit val ec = scala.concurrent.ExecutionContext.global
    checked(call("run", sql, if (args.isEmpty) null else args)).map(toRows)
  }

  def execute(sql: String, args: Seq[Any] = Nil): Seq[Seq[Any]] =
    Await.result(executeAsync(sql, args), syncTimeout)

  /** SELECT with a CHUNKED response ([[Wire]] "5" protocol): the server
    * streams the result as `chunkRows`-sized frames, so results past
    * the server's single-frame `maxWireRows` bound arrive complete —
    * the reference's streamed-range-read behavior. The rows future
    * completes on the stream's final frame.
    */
  def executeChunkedAsync(sql: String, args: Seq[Any] = Nil,
      chunkRows: Int = 10000): Future[Seq[Seq[Any]]] = {
    implicit val ec = scala.concurrent.ExecutionContext.global
    require(chunkRows > 0, s"chunkRows must be positive, got $chunkRows")
    checked(call("run", sql, if (args.isEmpty) null else args,
      chunkRows = chunkRows)).map(toRows)
  }

  def executeChunked(sql: String, args: Seq[Any] = Nil,
      chunkRows: Int = 10000): Seq[Seq[Any]] =
    Await.result(executeChunkedAsync(sql, args, chunkRows), syncTimeout)

  /** Prepare once, run many (reference prepare/preparedId protocol). */
  def prepare(sql: String): Int = syncCall("prepare", sql) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw OtError(s"Unexpected prepare result $other")
  }

  /** `useCache=true` opts a prepared select into the server's TTL
    * response cache (reference doc key "4").
    */
  def executePrepared(id: Int, args: Seq[Any] = Nil,
      useCache: Boolean = false): Seq[Seq[Any]] =
    toRows(syncCall("run", id, if (args.isEmpty) null else args, useCache))

  /** Batched insert through a prepared statement. */
  def batchInsert(preparedId: Int, argsArray: Seq[Seq[Any]]): Unit =
    syncCall("batch", preparedId, argsArray)

  /** Scatter-gather over the wire (the reference client's marquee use of
    * async futures, client/opentick.go:302-317): pipeline one range
    * query per [[Client.splitRange]] part over this SAME connection,
    * gather all futures, and merge with EXACT junction dedup — the
    * inclusive sub-range ends mean every row at a shared boundary value
    * arrives at the tail of part i AND the head of part i+1. One extra
    * pipelined point query per junction ([boundary, boundary]) measures
    * exactly how many rows that is, so the merge drops precisely the
    * overlap run — correct even when the projection omits the PK and
    * rows elsewhere happen to be value-identical (a heuristic run match
    * or whole-row distinct both lose data there). A caller whose SQL
    * uses exclusive bounds gets overlap 0 and a plain concatenation.
    */
  def executeRangesAsync(sql: String,
      parts: Seq[(Any, Any)]): Future[Seq[Seq[Any]]] = {
    implicit val ec = scala.concurrent.ExecutionContext.global
    require(parts.nonEmpty, "empty range split")
    val partF = parts.map { case (lo, hi) => executeAsync(sql, Seq(lo, hi)) }
    // junction i sits between part i and part i+1; only contiguous
    // parts (hi == next lo) can duplicate rows
    val overlapF = parts.sliding(2).toSeq.map {
      case Seq((_, hi), (lo, _)) if hi == lo =>
        executeAsync(sql, Seq(hi, hi)).map(_.length)
      case _ => Future.successful(0)
    }
    for {
      ps <- Future.sequence(partF)
      os <- Future.sequence(overlapF)
    } yield NetClient.mergeParts(ps, os)
  }

  def executeRanges(sql: String, parts: Seq[(Any, Any)]): Seq[Seq[Any]] =
    Await.result(executeRangesAsync(sql, parts), syncTimeout)

  def listDatabases(): Seq[String] =
    toRows(syncCall("meta", "list_databases")).flatten.map(_.toString)

  def listTables(): Seq[String] =
    toRows(syncCall("meta", "list_tables")).flatten.map(_.toString)

  /** (keys, values) as (name, type) pairs, like the reference's meta
    * schema response.
    */
  def schema(table: String): Seq[Seq[Seq[String]]] =
    syncCall("meta", s"schema $table") match {
      case s: Seq[_] => s.map {
        case part: Seq[_] => part.map {
          case col: Seq[_] => col.map(_.toString)
          case other => Seq(other.toString)
        }
        case other => Seq(Seq(other.toString))
      }
      case other => throw OtError(s"Unexpected schema result $other")
    }

  def close(): Unit = {
    alive = false
    try sock.close() catch { case NonFatal(_) => }
  }
}

object NetClient {
  /** Merge PK-ordered per-part scatter-gather results: part i+1 drops
    * its first `overlaps(i)` rows — the measured count of rows at the
    * shared boundary value, which arrive as the tail run of part i AND
    * the head run of part i+1 (both range ends inclusive). Exact for
    * any projection: the count comes from a boundary point query, not
    * from comparing row values.
    */
  private[engine] def mergeParts(parts: Seq[Seq[Seq[Any]]],
      overlaps: Seq[Int]): Seq[Seq[Any]] = {
    require(overlaps.length == parts.length - 1,
      "one overlap count per junction")
    val out = Seq.newBuilder[Seq[Any]]
    out ++= parts.head
    parts.tail.zip(overlaps).foreach { case (p, k) => out ++= p.drop(k) }
    out.result()
  }
}

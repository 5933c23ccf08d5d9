package graft.engine

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal BSON codec, hand-implemented from the public BSON spec
  * (bsonspec.org) — the reference's DEFAULT wire mode (reference
  * server.go:287-291 negotiates BSON unless the client's first frame is
  * `protocol=json`). Only the element types the wire documents use are
  * implemented: double (0x01), string (0x02), embedded document (0x03),
  * array (0x04), boolean (0x08), UTC datetime (0x09, decode only),
  * null (0x0A), int32 (0x10), int64 (0x12).
  *
  * Value model matches [[Wire]]'s JSON codec exactly: documents are
  * `Map[String, Any]`, arrays are `Seq[Any]`, timestamps travel as
  * `[epochSeconds, nanos]` pairs (encoded from `java.time.Instant`),
  * int32 decodes to Int and int64 to Long — so the dispatch layer is
  * codec-agnostic.
  */
object Bson {
  // ── encode ──

  /** Documents encode with keys in CANONICAL SORTED ORDER — the Go
    * client's convention — so every frame is deterministic regardless
    * of Scala Map iteration order. For the wire's ≤4-key request docs
    * ("0".."3") insertion order already equals sorted order (Map1..4
    * preserve insertion), so this changes no committed golden byte;
    * what it adds is determinism for the 5-key chunked/cached forms
    * ("0","1","2","3","5"), which Scala's HashMap would otherwise
    * iterate in hash order and which the cross-SDK session goldens
    * now pin (round-11 verdict item 5). Array elements are NOT
    * sorted — their keys are positional indices ("0","1",...,"10")
    * whose lexicographic order diverges from position past 9.
    */
  def encode(doc: Map[String, Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    writeDoc(out, doc.toSeq.sortBy(_._1))
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream,
      elems: Seq[(String, Any)]): Unit = {
    val body = new java.io.ByteArrayOutputStream(64)
    elems.foreach { case (k, v) => writeElement(body, k, v) }
    // int32 total = 4 (itself) + elements + 1 (terminator)
    writeInt32(out, 4 + body.size() + 1)
    body.writeTo(out)
    out.write(0x00)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String,
      v: Any): Unit = v match {
    case null =>
      out.write(0x0A); writeCString(out, name)
    case x: Boolean =>
      out.write(0x08); writeCString(out, name)
      out.write(if (x) 1 else 0)
    case x: Int =>
      out.write(0x10); writeCString(out, name); writeInt32(out, x)
    case x: Long =>
      out.write(0x12); writeCString(out, name); writeInt64(out, x)
    case x: Double =>
      out.write(0x01); writeCString(out, name)
      writeInt64(out, java.lang.Double.doubleToLongBits(x))
    case x: Float =>
      writeElement(out, name, x.toDouble)
    case x: Short => writeElement(out, name, x.toInt)
    case x: Byte => writeElement(out, name, x.toInt)
    case x: String =>
      out.write(0x02); writeCString(out, name)
      val bytes = x.getBytes(StandardCharsets.UTF_8)
      writeInt32(out, bytes.length + 1)
      out.write(bytes); out.write(0x00)
    case t: java.time.Instant =>
      // the wire convention: (sec, nsec) pair, full ns fidelity
      writeElement(out, name, Seq[Any](t.getEpochSecond, t.getNano.toLong))
    case t: java.sql.Timestamp => writeElement(out, name, t.toInstant)
    case s: Seq[_] =>
      out.write(0x04); writeCString(out, name)
      writeDoc(out, s.zipWithIndex.map { case (x, i) => i.toString -> x })
    case m: Map[_, _] =>
      out.write(0x03); writeCString(out, name)
      writeDoc(out,
        m.toSeq.map { case (k, x) => k.toString -> x }.sortBy(_._1))
    case other =>
      throw OtError(s"BSON: unsupported value ${other.getClass.getName}")
  }

  private def writeCString(out: java.io.ByteArrayOutputStream,
      s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0x00)
  }

  // direct LE byte writes: no per-field ByteBuffer allocation on the
  // wire hot path (a maxWireRows response encodes millions of fields)
  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt)
    writeInt32(out, (v >>> 32).toInt)
  }

  // ── decode ──

  def decode(bytes: Array[Byte]): Map[String, Any] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    readDoc(buf).toMap
  }

  private def readDoc(buf: ByteBuffer): Seq[(String, Any)] = {
    val total = buf.getInt()
    val end = buf.position() + total - 5 // minus length int32 + terminator
    val elems = Seq.newBuilder[(String, Any)]
    while (buf.position() < end) {
      val tpe = buf.get()
      val name = readCString(buf)
      elems += name -> readValue(buf, tpe)
    }
    val term = buf.get()
    if (term != 0x00) throw OtError("BSON: missing document terminator")
    elems.result()
  }

  private def readValue(buf: ByteBuffer, tpe: Byte): Any = tpe match {
    case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong())
    case 0x02 =>
      val len = buf.getInt()
      val bytes = new Array[Byte](len - 1)
      buf.get(bytes)
      if (buf.get() != 0x00) throw OtError("BSON: unterminated string")
      new String(bytes, StandardCharsets.UTF_8)
    case 0x03 => readDoc(buf).toMap
    case 0x04 => readDoc(buf).map(_._2)
    case 0x05 => // binary: int32 len + subtype + bytes (tolerated)
      val len = buf.getInt(); buf.get()
      val bytes = new Array[Byte](len); buf.get(bytes); bytes
    case 0x08 => buf.get() != 0
    case 0x09 => // UTC datetime, ms since epoch (foreign encoders)
      val ms = buf.getLong()
      java.time.Instant.ofEpochMilli(ms)
    case 0x0A => null
    case 0x10 => buf.getInt()
    case 0x11 => buf.getLong() // Mongo timestamp: opaque uint64
    case 0x12 => buf.getLong()
    case other => throw OtError(f"BSON: unsupported element type 0x$other%02x")
  }

  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.get() != 0x00) ()
    val len = buf.position() - start - 1
    val bytes = new Array[Byte](len)
    buf.position(start)
    buf.get(bytes)
    buf.get() // terminator
    new String(bytes, StandardCharsets.UTF_8)
  }
}

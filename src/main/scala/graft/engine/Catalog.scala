package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Filesystem-backed catalog + table storage.
  *
  * Layout (one directory tree per warehouse — the Spark-native analog of
  * the reference's FDB directory layer, reference schema.go:40-47):
  *
  *   warehouse/<db>/<table>/schema.json      column defs + PK (logical names)
  *   warehouse/<db>/<table>/phys.json        physical parquet column names
  *   warehouse/<db>/<table>/data/            parquet, append-only, __seq col
  *   warehouse/<db>/<table>/deletes/         deletion vectors (PK + __dseq)
  *   warehouse/<db>/<table>/seq              monotonic write counter
  *
  * Write semantics: INSERT appends whole rows stamped with a monotonic
  * `__seq`; the read path resolves last-write-wins per PK with a window
  * (SURVEY.md §1.3). At 100 TB this is the standard log+compact layout:
  * appends are cheap parallel parquet writes, and `compact()` folds the
  * log back to one version per key.
  *
  * DELETE writes deletion vectors: the matched PK tuples land in
  * `deletes/` stamped with the delete's sequence number, and reads mask
  * any row version older than a tombstone for its key. No data file is
  * rewritten (a 100 TB table must not be rewritten to drop a range);
  * `compact()` folds tombstones away.
  *
  * Column renames are metadata-only: every data file is written with the
  * table's PHYSICAL column names (`phys.json`, fixed at CREATE TABLE) and
  * reads rename physical→logical, so files written before and after a
  * rename agree and no rewrite happens.
  */
final class Catalog(val spark: SparkSession, val warehouse: String) {
  val SeqCol = "__seq"
  private val schemaCache = TrieMap.empty[String, TableDef]

  // ── nanosecond fidelity ──────────────────────────────────────────
  // Spark TimestampType is µs; the reference keys rows by (sec, nsec)
  // at full ns (query.go:754-779). Every Timestamp column therefore
  // stores a companion `<name>__ns` INT remainder (0-999): it joins the
  // key identity (LWW windows, deletion vectors, compaction), the sort
  // order, and the engine's predicate bounds, so ns-distinct keys stay
  // distinct and ns ranges compare exactly. External reads hide the
  // remainder; the µs TimestampType column is the display value.

  /** Logical ns-remainder column name. */
  def nsCol(name: String): String = name + "__ns"

  /** Timestamp columns of the table (the ones carrying remainders). */
  private def tsCols(td: TableDef): Seq[String] =
    td.cols.filter(_.tpe == OtType.Timestamp).map(_.name)

  /** Key columns expanded with ns remainders — the PHYSICAL key
    * identity used by windows, DVs and sorts.
    */
  def keyColsWithNs(td: TableDef): Seq[String] =
    td.keys.flatMap(k =>
      if (k.tpe == OtType.Timestamp) Seq(k.name, nsCol(k.name))
      else Seq(k.name))

  private def nsColNames(td: TableDef): Seq[String] = tsCols(td).map(nsCol)

  private def dbPath(db: String): Path = Paths.get(warehouse, db)
  private def tblPath(db: String, tbl: String): Path = Paths.get(warehouse, db, tbl)

  // ── databases ──

  /** Physical data directory of a table — for the bench harness's scan
    * profiling (reading the same files without the engine's ordered
    * machinery); not part of the query surface.
    */
  def dataPath(td: TableDef): String = dataDir(td).toString

  def hasDatabase(db: String): Boolean = Files.isDirectory(dbPath(db))

  def createDatabase(db: String): Unit = {
    if (hasDatabase(db)) throw OtError(s"Database $db already exists")
    Files.createDirectories(dbPath(db))
    // every database gets its _adj_ table (reference schema.go:65,247-262)
    createTable(TableDef.build(db, "_adj_",
      Seq("sec" -> OtType.Int, "time" -> OtType.Timestamp,
        "px" -> OtType.Double, "vol" -> OtType.Double),
      Seq("sec", "time")))
  }

  def dropDatabase(db: String): Unit = {
    if (!hasDatabase(db)) throw OtError(s"Database $db does not exist")
    listTables(db).foreach(t => dropTable(db, t))
    deleteRecursively(dbPath(db))
  }

  def listDatabases(): Seq[String] = listDirs(Paths.get(warehouse))

  def listTables(db: String): Seq[String] = {
    if (!hasDatabase(db)) throw OtError(s"Database $db does not exist")
    listDirs(dbPath(db))
  }

  /** Directory-stream helper: `Files.list`/`Files.walk` hold an open
    * fd until closed — and several of these run on the per-query hot
    * path, where leaked handles would exhaust the ulimit on a
    * long-lived server.
    */
  private def withStream[A, B](s: java.util.stream.Stream[A])(
      f: Iterator[A] => B): B =
    try f(s.iterator.asScala) finally s.close()

  private def listDirs(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Nil
    else withStream(Files.list(p))(_.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      withStream(Files.walk(p))(_.toSeq).reverse.foreach(Files.delete)
    }
  }

  // ── tables ──

  def hasTable(db: String, tbl: String): Boolean =
    Files.isDirectory(tblPath(db, tbl))

  def createTable(td: TableDef): Unit = {
    if (!hasDatabase(td.dbName))
      throw OtError(s"Database ${td.dbName} does not exist")
    if (hasTable(td.dbName, td.tblName))
      throw OtError(s"Table ${td.dbName}.${td.tblName} already exists")
    val dir = tblPath(td.dbName, td.tblName)
    Files.createDirectories(dir)
    writeSchema(dir, td)
    // physical parquet names are fixed forever at creation; renames only
    // touch schema.json
    writePhysNames(dir, td.cols.map(_.name))
  }

  def dropTable(db: String, tbl: String): Unit = {
    // error string parity: "does not exists" [sic] (reference schema.go:356)
    if (!hasTable(db, tbl)) throw OtError(s"Table $db.$tbl does not exists")
    schemaCache.remove(s"$db.$tbl")
    deleteRecursively(tblPath(db, tbl))
  }

  def getSchema(db: String, tbl: String): TableDef =
    schemaCache.getOrElseUpdate(s"$db.$tbl", {
      if (!hasTable(db, tbl)) throw OtError(s"Table $db.$tbl does not exists")
      readSchema(tblPath(db, tbl), db, tbl)
    })

  def renameTable(db: String, tbl: String, to: String): Unit = {
    val td = getSchema(db, tbl)
    schemaCache.remove(s"$db.$tbl")
    Files.move(tblPath(db, tbl), tblPath(db, to),
      StandardCopyOption.ATOMIC_MOVE)
    writeSchema(tblPath(db, to), td.copy(tblName = to))
  }

  def renameColumn(db: String, tbl: String, from: String, to: String): Unit = {
    val td = getSchema(db, tbl)
    if (!td.nameMap.contains(from)) throw OtError(s"Column $from does not exist")
    if (td.nameMap.contains(to)) throw OtError(s"Column $to already exists")
    // mirror CREATE TABLE's reserved-suffix validation: a logical name
    // colliding with the ns-companion/seq storage columns would corrupt
    // the phys↔logical mapping
    if (to.endsWith("__ns") || to == "__seq")
      throw OtError(s"Column name $to is reserved")
    schemaCache.remove(s"$db.$tbl")
    val cols = td.cols.map(c => if (c.name == from) c.copy(name = to) else c)
    val keys = td.keyNames.map(k => if (k == from) to else k)
    val nd = TableDef(db, tbl, cols, keys)
    writeSchema(tblPath(db, tbl), nd)
    // data untouched: files keep the physical names recorded in phys.json
    // (fixed at CREATE TABLE), and both reads and future writes go through
    // that mapping — so files written before and after the rename agree
  }

  // ── data ──

  private def dataDir(td: TableDef): Path = tblPath(td.dbName, td.tblName).resolve("data")
  private def deletesDir(td: TableDef): Path =
    tblPath(td.dbName, td.tblName).resolve("deletes")

  private def hasParquet(d: Path): Boolean =
    Files.isDirectory(d) && withStream(Files.list(d))(_.exists { f =>
      f.getFileName.toString.endsWith(".parquet")
    })

  private def hasData(td: TableDef): Boolean = hasParquet(dataDir(td))
  private def hasDeletes(td: TableDef): Boolean = hasParquet(deletesDir(td))

  /** Rename a file-schema DataFrame from physical to logical names (the
    * recorded mapping is positional against td.cols; ns remainder
    * columns follow their timestamp column's name).
    */
  private def physToLogical(td: TableDef, df: DataFrame): DataFrame = {
    val phys = physNames(td)
    val logical = td.cols.map(_.name)
    renameAll(df, phys.zip(logical).flatMap { case (p, l) =>
      Seq(p -> l, nsCol(p) -> nsCol(l))
    }.toMap)
  }

  /** Apply a whole column-rename mapping in ONE positional select —
    * chained withColumnRenamed would pass through intermediate states
    * where a cyclic mapping (a→c, b→a, c→b) creates duplicate names and
    * renames the wrong column. Columns outside the mapping (__seq,
    * __dseq, __rn) pass through unchanged; identity mappings short-
    * circuit to keep clean-read plans Project-free.
    */
  private def renameAll(df: DataFrame, m: Map[String, String]): DataFrame = {
    val cols = df.columns
    if (cols.forall(c => m.getOrElse(c, c) == c)) df
    else df.select(cols.map(c => col(c).as(m.getOrElse(c, c))).toSeq: _*)
  }

  /** Raw append-log rows incl. __seq and ns remainders, with the
    * physical→logical column rename applied. Deletion vectors NOT
    * applied — see [[maskedData]].
    */
  private def rawData(td: TableDef): DataFrame = {
    if (!hasData(td)) {
      val schema = logicalSchemaWithNs(td).add(SeqCol, LongType,
        nullable = false)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    }
    physToLogical(td, spark.read.parquet(dataDir(td).toString))
  }

  /** Deletion vectors as (logical key cols..., __dseq), or None. */
  private def deleteVectors(td: TableDef): Option[DataFrame] =
    if (!hasDeletes(td)) None
    else Some(physToLogical(td, spark.read.parquet(deletesDir(td).toString)))

  /** Append-log rows with deletion vectors applied: a row is masked when
    * some tombstone for its key is newer than the row version. One
    * max-aggregate over the (small) DV side plus a left join that AQE
    * broadcasts when the DV set is small — data files are never read for
    * masking beyond the scan already happening.
    */
  private def maskedData(td: TableDef,
      maxSeqExclusive: Option[Long] = None): DataFrame = {
    val base0 = rawData(td)
    val base = maxSeqExclusive.fold(base0)(s => base0.filter(col(SeqCol) < s))
    deleteVectors(td) match {
      case None => base
      case Some(dv0) =>
        val kc = keyColsWithNs(td)
        val dv = maxSeqExclusive.fold(dv0)(s => dv0.filter(col("__dseq") < s))
          .groupBy(kc.map(col): _*)
          .agg(max(col("__dseq")).as("__dseq"))
        base.join(dv, kc, "left")
          .filter(col("__dseq").isNull || col(SeqCol) > col("__dseq"))
          .drop("__dseq")
    }
  }

  /** Last-write-wins view of a table (upsert semantics, whole-row
    * replace — reference query.go:302 `tr.Set`). When the log is known
    * clean — nothing written since the last compaction/import — the
    * dedup window (a full shuffle) is skipped entirely: reads of
    * read-mostly tables are plain pruned parquet scans.
    */
  def readTable(td: TableDef): DataFrame =
    readTableKeepNs(td).drop(nsColNames(td): _*)

  /** [[readTable]] keeping the ns remainder columns — the engine's
    * SELECT path needs them for ns-exact predicates and sort.
    */
  def readTableKeepNs(td: TableDef): DataFrame = {
    if (isClean(td)) return rawData(td).drop(SeqCol)
    val w = Window.partitionBy(keyColsWithNs(td).map(col): _*)
      .orderBy(col(SeqCol).desc)
    maskedData(td)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", SeqCol)
  }

  /** Range-ordered read of a CLEAN table with no sort in the plan: the
    * compacted/imported layout is `repartitionByRange` on the leading key
    * + `sortWithinPartitions` on the full PK, so the part files form
    * disjoint, name-ordered key ranges and are internally PK-sorted.
    * [[graft.plans.OrderedParquetScan]] enumerates them in that order
    * through ONE scan node — plan size is O(1) in the file count (the
    * previous per-file union chain grew a plan node per file), collect
    * order IS global PK order, zero Exchange, and files of any size are
    * fine (they are never split).
    *
    * `pushed` filters use LOGICAL column names; they are remapped to the
    * physical file names and handed to the parquet reader for row-group
    * pruning — the pushdown that makes a point/prefix SELECT skip nearly
    * all data even at thousands of files. Callers must keep the exact
    * predicate on top (pruning is a superset gate).
    *
    * Returns None (caller falls back to an explicit sort) when the table
    * is dirty or empty.
    */
  def readTableOrdered(td: TableDef, reverse: Boolean,
      pushed: Seq[org.apache.spark.sql.sources.Filter] = Nil)
      : Option[DataFrame] = {
    if (!isClean(td) || !hasData(td)) return None
    val files = withStream(Files.list(dataDir(td)))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
      .sortBy(_.getFileName.toString)
    if (files.isEmpty) return None
    val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes",
      (128L * 1024 * 1024).toString).takeWhile(_.isDigit).toLong
    val metas = files.map(f =>
      graft.plans.OrderedParquetScan.FileMeta(f.toString, Files.size(f)))
    // Reverse scans reverse one whole file's rows on-heap (one file per
    // partition). Bound that buffer: if any part file outgrew the split
    // budget (e.g. an oversized compaction), decline the ordered path and
    // let the caller's explicit-sort fallback — which spills — handle it.
    if (reverse && metas.exists(_.size > maxSplit)) return None
    val schema = physSchema(td).add(SeqCol, LongType, nullable = true)
    val physFilters = pushed.map(remapFilterToPhys(td, _))
    val df = graft.plans.OrderedParquetScan.read(spark, metas, schema,
      physFilters, reverse, maxSplit)
    Some(physToLogical(td, df).drop(SeqCol))
  }

  /** Range-ordered LWW read of a DIRTY table — the SELECT fallback when
    * [[readTableOrdered]] declines. One range exchange + in-partition
    * sort on (PK incl. ns remainders, `__seq` desc) + an adjacent-run
    * first-wins dedupe, instead of the previous two-shuffle shape (hash
    * window for LWW, then a global sort for presentation order). After
    * the sort, all versions of a key are adjacent with the newest
    * first, so keeping each key-run's first row IS last-write-wins, and
    * concatenated range partitions are already in global PK order
    * (reverse order when `reverse`) — the same presentation contract as
    * the clean path (reference query.go:158). At 100 TB this is the
    * standard LSM merge-read: one shuffle of the log, however many
    * appends have landed.
    *
    * `pre` is an optional PK predicate applied BEFORE the exchange —
    * every version of a key shares its PK values, so PK predicates
    * commute with per-key LWW dedupe, and filtering early keeps the
    * shuffle sized to the selected range. The adjacent dedupe is a
    * `mapPartitions` (the narrow-operator exception the design doc
    * allows): no composition of declarative ops expresses "first row
    * of each equal-key run" without re-introducing a hash exchange.
    */
  def readTableOrderedDirty(td: TableDef, reverse: Boolean,
      pre: Option[org.apache.spark.sql.Column]): DataFrame = {
    val base0 = maskedData(td)
    val base = pre.map(base0.filter).getOrElse(base0)
    val keys = keyColsWithNs(td)
    def dir(n: String) = if (reverse) col(n).desc else col(n).asc
    val sortCols = keys.map(dir) :+ col(SeqCol).desc
    // range partitioning pays a SAMPLING pass over the source to pick
    // boundaries; when the whole log fits one scan split the sorted
    // output is a single partition anyway, so a plain 1-partition
    // exchange (no sampling) is strictly cheaper. The byte gate keeps
    // this a small-table fast path — big logs take the sampled range
    // exchange that scales.
    val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes",
      (128L * 1024 * 1024).toString).takeWhile(_.isDigit).toLong
    val logBytes = {
      val d = dataDir(td)
      if (!Files.isDirectory(d)) 0L
      else withStream(Files.list(d))(_.map(p =>
        try Files.size(p) catch { case _: Throwable => 0L }).sum)
    }
    val sorted =
      if (logBytes <= maxSplit)
        base.repartition(1).sortWithinPartitions(sortCols: _*)
      else base.repartitionByRange(keys.map(dir): _*)
        .sortWithinPartitions(sortCols: _*)
    // adjacent-run first-wins dedupe at the InternalRow level: the
    // external-Row encoder round trip costs more than the whole scan
    // at this shape. Rows arrive as reused UnsafeRow buffers, so the
    // previous key is copied out (UTF8String values materialized) for
    // the comparison; emitted rows keep Spark's standard reused-buffer
    // contract (downstream operators copy when they buffer).
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val keyTypes = keyIdx.map(schema(_).dataType)
    val rdd = sorted.queryExecution.toRdd.mapPartitions { it =>
      val nk = keyIdx.length
      var prev: Array[Any] = null
      it.filter { r =>
        val cur = new Array[Any](nk)
        var i = 0
        var same = prev != null
        while (i < nk) {
          cur(i) = r.get(keyIdx(i), keyTypes(i)) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => other
          }
          if (same && cur(i) != prev(i)) same = false
          i += 1
        }
        if (!same) prev = cur
        !same
      }
    }
    org.apache.spark.sql.graftshim.GraftSqlShims
      .internalDf(spark, rdd, schema).drop(SeqCol)
  }

  /** Rename the column of a pushed-down filter from logical to physical
    * (only the comparison shapes the engine generates).
    */
  private def remapFilterToPhys(td: TableDef,
      f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.sources._
    def p(n: String): String = logicalToPhysNames(td, Seq(n)).head
    f match {
      case EqualTo(n, v) => EqualTo(p(n), v)
      case GreaterThan(n, v) => GreaterThan(p(n), v)
      case GreaterThanOrEqual(n, v) => GreaterThanOrEqual(p(n), v)
      case LessThan(n, v) => LessThan(p(n), v)
      case LessThanOrEqual(n, v) => LessThanOrEqual(p(n), v)
      case other => other
    }
  }

  /** Time-travel: the LWW view as of write batch `seq` (inclusive) — a
    * free capability of the append-log layout. `writeVersion` returns
    * the current batch counter to capture before mutating. Deletion
    * vectors newer than `seq` are ignored, so travel before a DELETE
    * resurrects the rows.
    */
  def readTableAsOf(td: TableDef, seq: Long): DataFrame = {
    val w = Window.partitionBy(keyColsWithNs(td).map(col): _*)
      .orderBy(col(SeqCol).desc)
    maskedData(td, Some((seq + 1) * 1000000L)) // batch seqs pack row idx
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop(("__rn" +: SeqCol +: nsColNames(td)): _*)
  }

  def writeVersion(td: TableDef): Long = currentSeq(td)

  private def cleanMarker(td: TableDef): Path =
    tblPath(td.dbName, td.tblName).resolve("clean_at_seq")

  private def currentSeq(td: TableDef): Long = {
    val p = tblPath(td.dbName, td.tblName).resolve("seq")
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  /** True when no write has landed since the last compact/import. */
  private def isClean(td: TableDef): Boolean = {
    val m = cleanMarker(td)
    Files.exists(m) &&
      new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim.toLong ==
        currentSeq(td)
  }

  private def markClean(td: TableDef): Unit =
    Files.write(cleanMarker(td),
      currentSeq(td).toString.getBytes(StandardCharsets.UTF_8))

  private def nextSeq(td: TableDef): Long = {
    // the read-modify-write is serialized on the catalog monitor: engine
    // mutations hold the engine lock, but direct catalog calls (compact,
    // appendRows from library code) must not race a concurrent wire
    // batch to the same seq. Cross-process claims are out of scope (the
    // reference is a single server process too).
    this.synchronized {
      val p = tblPath(td.dbName, td.tblName).resolve("seq")
      val cur = if (Files.exists(p))
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
      else 0L
      Files.write(p, (cur + 1).toString.getBytes(StandardCharsets.UTF_8))
      cur + 1
    }
  }

  /** Rename a logical-name DataFrame to physical names for writing. */
  private def logicalToPhys(td: TableDef, df: DataFrame): DataFrame =
    renameAll(df, td.cols.map(_.name).zip(physNames(td)).flatMap {
      case (l, p) => Seq(l -> p, nsCol(l) -> nsCol(p))
    }.toMap)

  /** Physical file schema: each Timestamp column is followed by its
    * `__ns` remainder.
    */
  private def physSchema(td: TableDef): StructType =
    StructType(td.cols.zip(physNames(td)).flatMap { case (c, p) =>
      val main = StructField(p, c.tpe.spark, nullable = !c.isKey)
      if (c.tpe == OtType.Timestamp)
        Seq(main, StructField(nsCol(p), IntegerType, nullable = !c.isKey))
      else Seq(main)
    })

  /** Logical schema incl. ns remainders (the rawData shape). */
  private def logicalSchemaWithNs(td: TableDef): StructType =
    StructType(td.cols.flatMap { c =>
      val main = StructField(c.name, c.tpe.spark, nullable = !c.isKey)
      if (c.tpe == OtType.Timestamp)
        Seq(main, StructField(nsCol(c.name), IntegerType, nullable = !c.isKey))
      else Seq(main)
    })

  /** Append whole rows (order matches td.cols). One call = one batch =
    * one `__seq` stamp (rows within a batch share it; later batch wins,
    * within a batch the last row wins via row index tiebreak packed into
    * the low 6 decimal digits — hence the 1M-row batch cap, which keeps
    * a batch from overflowing into the next batch's seq space and
    * corrupting LWW/time-travel ordering).
    */
  def appendRows(td: TableDef, rows: Seq[Seq[Any]]): Unit = {
    if (rows.length >= 1000000)
      throw OtError("Batch insert of 1000000 rows or more is not " +
        "supported; split into smaller batches")
    // FDB-analog BYTE bound (reference bindings/go/test.go:58-59 sizes
    // its batches "limited by foundationdb transaction size" — FDB
    // caps a transaction at 10 MB): the row-count guard alone misses
    // wide text rows (500k 1 KB documents is 500 MB of driver-held
    // payload under the 1M-row cap). The estimate is one cheap pass —
    // ~9 bytes per fixed-width cell (tag + value), string length + 13
    // framing — deliberately coarse; it guards driver memory and
    // mirrors the reference's batch-size contract, not an exact codec.
    var estBytes = 0L
    rows.foreach { r =>
      var c = 0
      while (c < r.length) {
        estBytes += (r(c) match {
          case s: String => 13L + s.length
          case null => 1L
          case _ => 9L
        })
        c += 1
      }
    }
    if (estBytes > Catalog.MaxBatchBytes)
      throw OtError(s"Batch insert of ~$estBytes bytes exceeds the " +
        s"${Catalog.MaxBatchBytes}-byte batch bound (the reference's " +
        "FoundationDB transaction-size limit); split into smaller batches")
    val seq = nextSeq(td)
    val schema = physSchema(td).add(SeqCol, LongType, nullable = false)
    // tight loop: this is the 100k-rows/batch ingest hot path
    val isTs = td.cols.map(_.tpe == OtType.Timestamp).toArray
    val width = schema.length
    val nCols = isTs.length
    var i = 0
    val cellRows = rows.iterator.map { r =>
      val cells = new Array[Any](width)
      var c = 0
      var o = 0
      while (c < nCols) {
        val v = r(c)
        if (isTs(c)) {
          // Timestamp splits into (µs Instant, sub-µs remainder)
          v match {
            case t: java.time.Instant =>
              val nano = t.getNano
              cells(o) = java.time.Instant.ofEpochSecond(t.getEpochSecond,
                nano / 1000L * 1000L)
              cells(o + 1) = nano % 1000
            case other =>
              cells(o) = other
              cells(o + 1) = if (other == null) null else 0
          }
          o += 2
        } else { cells(o) = v; o += 1 }
        c += 1
      }
      cells(width - 1) = seq * 1000000L + i
      i += 1
      cells
    }
    // a batch is driver-resident by contract: write the part file
    // directly (LocalParquet), skipping a per-batch Spark job + commit
    // protocol that buys no parallelism for a coalesce(1) write
    Files.createDirectories(dataDir(td))
    LocalParquet.write(
      dataDir(td).resolve(f"part-append-$seq%06d-${
        java.util.UUID.randomUUID}.parquet"),
      schema, cellRows)
  }

  /** Bulk import: distributed write of a whole DataFrame as seq-0 rows in
    * the PK-sorted layout (`repartitionByRange` on the leading key +
    * `sortWithinPartitions` on the full PK — SURVEY.md §1.3), so parquet
    * min/max stats give range pruning on PK scans. Column order/types
    * must already match the TableDef.
    */
  def importData(td: TableDef, df: DataFrame): Unit = {
    val wasEmpty = !hasData(td)
    val seq = nextSeq(td)
    // bulk imports arrive through Spark TimestampType (µs): remainders 0
    val withNs = tsCols(td).foldLeft(df)((d, c) =>
      d.withColumn(nsCol(c), lit(0)))
      .select(logicalSchemaWithNs(td).fieldNames.toIndexedSeq.map(col): _*)
    val sorted = logicalToPhys(td, withNs)
      .withColumn(SeqCol, lit(seq * 1000000L))
      .repartitionByRange(col(physNames(td).head))
      .sortWithinPartitions(logicalToPhysNames(td, keyColsWithNs(td))
        .map(col): _*)
    sorted.write.mode("append").parquet(dataDir(td).toString)
    // a bulk import into an empty table IS its compacted form: reads can
    // skip the LWW window until the next append lands
    if (wasEmpty) markClean(td)
  }

  /** Map logical column names (possibly incl. ns remainders) to their
    * physical file names.
    */
  private def logicalToPhysNames(td: TableDef,
      names: Seq[String]): Seq[String] = {
    val m = td.cols.map(_.name).zip(physNames(td)).flatMap { case (l, p) =>
      Seq(l -> p, nsCol(l) -> nsCol(p))
    }.toMap
    names.map(n => m.getOrElse(n, n))
  }

  /** Delete rows matching `pred` by writing deletion vectors: the
    * matched PK tuples land in `deletes/` stamped with this delete's
    * seq, and reads mask older row versions. O(matched keys), no data
    * file rewritten — the shape that survives a 100 TB table. A full
    * DELETE (no predicate) is a metadata drop of the data dir.
    */
  def deleteWhere(td: TableDef, pred: Option[org.apache.spark.sql.Column]): Unit = {
    if (!hasData(td)) return
    val dir = tblPath(td.dbName, td.tblName)
    pred match {
      case None =>
        deleteRecursively(dir.resolve("data"))
        deleteRecursively(dir.resolve("deletes"))
      case Some(p) =>
        // WHERE is PK-only (resolveWhere), so any version of a key
        // matches iff all do: distinct matched keys from the raw log
        val seq = nextSeq(td)
        val matched = rawData(td).filter(p)
          .select(keyColsWithNs(td).map(col): _*).distinct()
          .withColumn("__dseq", lit(seq * 1000000L))
        logicalToPhys(td, matched).coalesce(1)
          .write.mode("append").parquet(deletesDir(td).toString)
    }
  }

  /** Tail the table's append log as a stream: every appendRows batch is
    * one parquet file, so Spark's file-stream source surfaces each
    * insert batch as a micro-batch — a live subscription to table
    * changes (the push counterpart of the reference clients' polling).
    * Rows keep `__seq` for downstream LWW/ordering; physical→logical
    * renames are applied like any read.
    */
  def tailTable(td: TableDef): DataFrame = {
    Files.createDirectories(dataDir(td))
    val schema = physSchema(td).add(SeqCol, LongType, nullable = true)
    physToLogical(td,
      spark.readStream.schema(schema).parquet(dataDir(td).toString))
  }

  /** Fold the append log to one version per PK and fold deletion
    * vectors away (the scale-path maintenance op; optional for
    * correctness).
    */
  def compact(td: TableDef): Unit = {
    if (!hasData(td)) return
    val dir = tblPath(td.dbName, td.tblName)
    val w = Window.partitionBy(keyColsWithNs(td).map(col): _*)
      .orderBy(col(SeqCol).desc)
    val folded = maskedData(td)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val sorted = logicalToPhys(td, folded)
      .repartitionByRange(col(physNames(td).head))
      .sortWithinPartitions(logicalToPhysNames(td, keyColsWithNs(td))
        .map(col): _*)
    val tmp = dir.resolve("data_tmp")
    sorted.write.mode("overwrite").parquet(tmp.toString)
    deleteRecursively(dir.resolve("data"))
    Files.move(tmp, dir.resolve("data"), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(dir.resolve("deletes"))
    markClean(td)
  }

  // ── schema persistence (tiny hand-rolled JSON; idents are [A-Za-z0-9_]) ──

  private def writePhysNames(dir: Path, names: Seq[String]): Unit =
    Files.write(dir.resolve("phys.json"),
      names.map(n => s""""$n"""").mkString("[", ",", "]")
        .getBytes(StandardCharsets.UTF_8))

  /** Physical parquet column names, positional against td.cols. Tables
    * created before phys.json existed fall back to logical names.
    */
  private def physNames(td: TableDef): Seq[String] = {
    val p = tblPath(td.dbName, td.tblName).resolve("phys.json")
    if (!Files.exists(p)) td.cols.map(_.name)
    else "\"([^\"]*)\"".r
      .findAllMatchIn(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .map(_.group(1)).toSeq
  }

  private def writeSchema(dir: Path, td: TableDef): Unit = {
    val cols = td.cols.map(c => s"""["${c.name}","${c.tpe.name}"]""")
      .mkString("[", ",", "]")
    val keys = td.keyNames.map(k => s""""$k"""").mkString("[", ",", "]")
    val json = s"""{"cols":$cols,"keys":$keys}"""
    Files.write(dir.resolve("schema.json"),
      json.getBytes(StandardCharsets.UTF_8))
  }

  private def readSchema(dir: Path, db: String, tbl: String): TableDef = {
    val json = new String(Files.readAllBytes(dir.resolve("schema.json")),
      StandardCharsets.UTF_8)
    // format is fully controlled (written above): extract quoted strings
    val colsPart = json.substring(json.indexOf("\"cols\":") + 7,
      json.indexOf(",\"keys\""))
    val keysPart = json.substring(json.indexOf("\"keys\":") + 7,
      json.lastIndexOf("}"))
    def strings(s: String): Seq[String] =
      "\"([^\"]*)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq
    val colStrs = strings(colsPart)
    val cols = colStrs.grouped(2).map { case Seq(n, t) =>
      n -> OtType.fromName(t)
    }.toSeq
    TableDef.build(db, tbl, cols, strings(keysPart))
  }
}

object Catalog {
  /** Per-batch estimated-byte bound for [[Catalog.appendRows]] — the
    * analog of the reference's FoundationDB 10 MB transaction-size
    * limit (reference bindings/go/test.go:58-59; FDB known-limitations
    * page), which is what actually capped the reference's batch
    * inserts. Complements the 1M-row guard: the row cap bounds seq
    * packing, this bounds driver-held payload for wide text rows.
    */
  val MaxBatchBytes: Long = 10000000L
}

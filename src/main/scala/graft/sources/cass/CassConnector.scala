package graft.sources.cass

import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Cassandra-table-shaped DataSource V2 connector — the pluggable
  * source/sink boundary BASELINE.json's approach statement names
  * ("Spark DataFrame + Cassandra connector for read/write sync").
  * On a real cluster the seam ([[CassandraLikeStore]]) swaps this
  * format for the Cassandra connector's; everything above the seam is
  * unchanged. Here the store is modeled the way Cassandra itself
  * stores tables — immutable generational SSTable files of cell
  * writes, merged by last-write-wins at read time — so the engine's
  * sync/CDC operators exercise real connector plumbing:
  *
  *   - one InputPartition per SSTable file (the token-range-scan
  *     shape: independent, location-prunable splits);
  *   - partition-key predicate pushdown (`SupportsPushDownFilters`):
  *     `row_key` comparisons are evaluated inside the reader AND
  *     prune whole SSTables via the per-file key ranges carried in
  *     the filename — the analogue of Cassandra's token ownership;
  *   - column pruning (`SupportsPushDownRequiredColumns`);
  *   - an append-only writer that emits one SSTable per task, range-
  *     stamped at commit (write-tmp-then-rename, so failed tasks
  *     leave no visible files).
  *
  * SSTable line format: `row_key,write_us,generation,tombstone,value`
  * (text — the point is the connector contract, not the byte format).
  */
class CassTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cass"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CassTableDef.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CassTable(properties.get("path"))
}

object CassTableDef {
  /** The fixed cell schema of a modeled Cassandra table. */
  // nullable on purpose: AppendData validation rejects nullable
  // inputs against NOT NULL table columns, and every upstream
  // DataFrame derivation is nullable by default
  val schema: StructType = StructType.fromDDL(
    "row_key BIGINT, write_us BIGINT, generation BIGINT, " +
    "tombstone BOOLEAN, value DOUBLE")

  private val SstableRe = "sstable-.*-k(-?\\d+)-(-?\\d+)\\.csv$".r.unanchored

  /** (minKey, maxKey) carried in an SSTable filename. */
  def keyRange(name: String): Option[(Long, Long)] = name match {
    case SstableRe(lo, hi) => Some((lo.toLong, hi.toLong))
    case _ => None
  }

  /** Conjunctive key bounds from the pushed filters (None = reject
    * everything, e.g. `row_key = 3 AND row_key = 4`).
    */
  def keyBounds(filters: Seq[Filter]): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case EqualTo("row_key", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue)
      case GreaterThan("row_key", v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("row_key", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("row_key", v: Number) => hi = math.min(hi, v.longValue - 1)
      case LessThanOrEqual("row_key", v: Number) => hi = math.min(hi, v.longValue)
      case In("row_key", vs) if vs.nonEmpty =>
        val ks = vs.map(_.asInstanceOf[Number].longValue)
        lo = math.max(lo, ks.min); hi = math.min(hi, ks.max)
      case _ => ()
    }
    if (lo > hi) None else Some((lo, hi))
  }

  /** Can the reader evaluate this filter exactly on the key column? */
  def isKeyFilter(f: Filter): Boolean = f match {
    case EqualTo("row_key", _: Number) => true
    case GreaterThan("row_key", _: Number) => true
    case GreaterThanOrEqual("row_key", _: Number) => true
    case LessThan("row_key", _: Number) => true
    case LessThanOrEqual("row_key", _: Number) => true
    case In("row_key", vs) => vs.forall(_.isInstanceOf[Number])
    case _ => false
  }

  def evalKeyFilter(f: Filter, key: Long): Boolean = f match {
    case EqualTo("row_key", v: Number) => key == v.longValue
    case GreaterThan("row_key", v: Number) => key > v.longValue
    case GreaterThanOrEqual("row_key", v: Number) => key >= v.longValue
    case LessThan("row_key", v: Number) => key < v.longValue
    case LessThanOrEqual("row_key", v: Number) => key <= v.longValue
    case In("row_key", vs) => vs.exists(_.asInstanceOf[Number].longValue == key)
    case _ => true
  }
}

class CassTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-cass requires a path option")
  override def name(): String = s"graft-cass:$path"
  override def schema(): StructType = CassTableDef.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CassScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CassWriteBuilder(path, info)
}

class CassScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CassTableDef.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (key, residual) = filters.partition(CassTableDef.isKeyFilter)
    pushed = key
    residual // key filters are evaluated exactly in the reader
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new CassScan(path, pushed, required)
}

case class CassInputPartition(file: String, minKey: Long, maxKey: Long)
  extends InputPartition

class CassScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CassScan path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
    s"ReadSchema: ${required.catalogString}"

  /** One split per SSTable, pruned by the key range stamped in each
    * filename against the pushed key bounds — the driver does one
    * LIST and never opens a data file.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return Array.empty
    val files = fs.listStatus(p).map(_.getPath)
      .filter(f => CassTableDef.keyRange(f.getName).isDefined)
      .sortBy(_.getName)
    CassTableDef.keyBounds(pushed.toSeq) match {
      case None => Array.empty
      case Some((lo, hi)) =>
        files.flatMap { f =>
          val Some((mn, mx)) = CassTableDef.keyRange(f.getName)
          if (mx < lo || mn > hi) None
          else Some(CassInputPartition(f.toString, mn, mx): InputPartition)
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CassReaderFactory(required.fieldNames, pushed)
}

class CassReaderFactory(requiredCols: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[CassInputPartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(part.file).getFileSystem(new Configuration())
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(new Path(part.file)), "UTF-8"))
      // projection: required column name -> index in the full cell
      private val proj = requiredCols.map(CassTableDef.schema.fieldIndex)
      private var row: InternalRow = _

      override def next(): Boolean = {
        var line = in.readLine()
        while (line != null) {
          val c = line.split(',')
          val key = c(0).toLong
          if (pushed.forall(CassTableDef.evalKeyFilter(_, key))) {
            // \N is the null-value token (tombstoned VALUE cell)
            val v: Any = if (c(4) == "\\N") null else c(4).toDouble
            val full = Array[Any](key, c(1).toLong, c(2).toLong,
              c(3).toBoolean, v)
            row = new GenericInternalRow(proj.map(full(_)))
            return true
          }
          line = in.readLine()
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

class CassWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new CassBatchWrite(path, info.schema())
  }
}

case class CassCommitMessage(tmp: String, finalName: String) extends WriterCommitMessage

class CassBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CassWriterFactory(path, schema.fieldNames)

  /** Make every task's tmp SSTable visible atomically (rename). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.foreach {
      case CassCommitMessage(tmp, finalName) if tmp.nonEmpty =>
        fs.rename(new Path(tmp), new Path(path, finalName))
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.foreach {
      case CassCommitMessage(tmp, _) if tmp.nonEmpty =>
        fs.delete(new Path(tmp), false)
      case _ => ()
    }
  }
}

class CassWriterFactory(path: String, writeCols: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // incoming rows arrive in the logical write schema's column
      // order; map them back to the canonical cell order
      private val idx = CassTableDef.schema.fieldNames.map(n => writeCols.indexOf(n))
      require(idx.forall(_ >= 0),
        s"graft-cass append requires all cell columns; got ${writeCols.mkString(",")}")
      private val tmpPath = new Path(path,
        s"_tmp-sstable-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}")
      private var out: java.io.BufferedWriter = _
      private var minKey = Long.MaxValue
      private var maxKey = Long.MinValue
      private var n = 0L

      override def write(rec: InternalRow): Unit = {
        if (out == null) {
          val fs = tmpPath.getFileSystem(new Configuration())
          fs.mkdirs(tmpPath.getParent)
          out = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(fs.create(tmpPath, true), "UTF-8"))
        }
        // key/timestamp/generation/tombstone cells have no null token:
        // fail loudly rather than silently writing 0 (which would
        // corrupt the LWW merge downstream). The VALUE cell is the
        // exception: a tombstone deletes the value, so it carries
        // null and serializes as the explicit \N token — a null value
        // on a LIVE cell is still a hard error.
        var i = 0
        while (i < idx.length - 1) {
          if (rec.isNullAt(idx(i)))
            throw new IllegalArgumentException(
              s"graft-cass append: null in required cell column " +
                s"'${CassTableDef.schema.fieldNames(i)}' (all cells are non-null)")
          i += 1
        }
        val tombstone = rec.getBoolean(idx(3))
        val valueIsNull = rec.isNullAt(idx(4))
        if (valueIsNull && !tombstone)
          throw new IllegalArgumentException(
            "graft-cass append: null value on a live (non-tombstone) cell")
        val key = rec.getLong(idx(0))
        minKey = math.min(minKey, key); maxKey = math.max(maxKey, key)
        val valueTok = if (valueIsNull) "\\N" else rec.getDouble(idx(4)).toString
        out.write(s"$key,${rec.getLong(idx(1))},${rec.getLong(idx(2))}," +
          s"$tombstone,$valueTok\n")
        n += 1
      }

      override def commit(): WriterCommitMessage = {
        if (out == null) CassCommitMessage("", "") // empty task: no file
        else {
          out.close()
          CassCommitMessage(tmpPath.toString,
            s"sstable-p$partitionId-t$taskId-k$minKey-$maxKey.csv")
        }
      }

      override def abort(): Unit = {
        if (out != null) {
          out.close()
          tmpPath.getFileSystem(new Configuration()).delete(tmpPath, false)
        }
      }
      override def close(): Unit = ()
    }
}

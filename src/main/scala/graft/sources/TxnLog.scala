package graft.sources

import java.io.File
import java.nio.file.Files
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ckpt.CutOps
import graft.analytics.Money

/** Lake-format primitives: a Delta-style transaction log, merge-on-read
  * deletion vectors, and file-stats data skipping (SURVEY.md §2.8
  * additions).
  *
  * The reference syncs immutable SSTable files and reconstructs state
  * from manifests (`Uploader._writeManifest`,
  * `bin/cassandra-syncer-restore`); the lake-format generalization of
  * that idea is a *transaction log*: every table mutation is an atomic
  * metadata commit naming the files it adds/removes, and a reader
  * resolves "the table at version V" purely from the log — no
  * directory listing, no eventual-consistency window, free time
  * travel. At 100 TB the log is KBs per commit describing TBs of data:
  * snapshot resolution is a metadata fold, the data path stays a
  * distributed columnar scan of exactly the live files.
  *
  * All three surfaces here share that "metadata describes data"
  * shape:
  *
  *  - [[ioTxnLog]] — versioned commits, snapshot-at-version reads,
  *    and a logical compaction (rewrite N files as one, remove the
  *    originals) that the oracle proves is content-invisible.
  *  - [[ioDeleteVectors]] — deletes without rewriting data files: a
  *    tiny (file, row_index) sidecar anti-joined into the scan —
  *    merge-on-read. A billion-row delete touches zero data bytes.
  *  - [[ioStatsPruneScan]] — per-file min/max column stats collected
  *    once at write time; a range query consults the manifest and
  *    opens only overlapping files (Iceberg-style data skipping,
  *    file-level — one granularity above parquet row-group stats).
  */
object TxnLog {

  // ---- transaction log core ----

  /** One committed action: add or remove a data file. */
  final case class Action(action: String, file: String, nRows: Long)

  private def logDir(root: String) = new File(root, "_txn_log")

  /** Atomically publish version `version`. The commit file is staged
    * under a temp name and *linked* into place — `createLink` fails if
    * the destination exists, so two writers racing on the same version
    * get exactly one winner (optimistic concurrency, the Delta
    * protocol's put-if-absent; on an object store this is a
    * conditional PUT).
    */
  /** JSON string escaping for commit lines: quote, backslash, and all
    * control chars — an unescaped quote in a file path would produce a
    * malformed line that a lenient reader silently nulls, dropping the
    * file from every snapshot. Paired with the FAILFAST read in
    * [[liveFiles]]: a corrupt line fails loudly, never silently.
    */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def commit(root: String, version: Int, actions: Seq[Action]): Unit = {
    val dir = logDir(root); dir.mkdirs()
    val tmp = new File(dir, s".v$version-${UUID.randomUUID().toString.take(8)}.tmp")
    // each action line carries its version so consumers (snapshot
    // resolution, the streaming change feed) never parse filenames
    val body = actions.map { a =>
      s"""{"version":$version,"action":${jsonStr(a.action)},"file":${jsonStr(a.file)},"n_rows":${a.nRows}}"""
    }.mkString("", "\n", "\n")
    Files.write(tmp.toPath, body.getBytes("UTF-8"))
    val dst = new File(dir, f"v$version%05d.json")
    try Files.createLink(dst.toPath, tmp.toPath)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"txn conflict: version $version already committed", e)
    } finally Files.deleteIfExists(tmp.toPath)
  }

  def latestVersion(root: String): Int = {
    val vs = Option(logDir(root).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("v\\d{5}\\.json"))
      .map(_.drop(1).take(5).toInt)
    require(vs.nonEmpty, s"no commits under $root")
    vs.max
  }

  /** Live data files at `asOf` (defaults to latest): version-ordered
    * replay — per file, the LAST action in the prefix wins, so a file
    * removed at version X and re-added at Y>X is live for asOf ≥ Y
    * (Delta log semantics; a plain adds−removes set-subtraction gets
    * this wrong). Within one version a remove beats an add — a commit
    * that both adds and removes a file is a net no-op. The fold is a
    * distributed max_by over metadata, FAILFAST so a corrupt commit
    * line fails the read instead of silently dropping files; only the
    * resolved live list (metadata-scale) is collected.
    */
  def liveFiles(spark: SparkSession, root: String, asOf: Option[Int] = None): Seq[String] = {
    val upTo = asOf.getOrElse(latestVersion(root))
    // time travel below the vacuum horizon fails CLEANLY at resolution
    // time (the data files are physically gone — without this guard
    // the failure would be a mid-scan missing-file error, or worse a
    // silently partial result for a version whose files partly survive)
    vacuumHorizon(root).foreach { h =>
      if (upTo < h) throw new IllegalStateException(
        s"time travel to version $upTo failed: vacuumed (horizon $h) — " +
          "data files referenced only by versions below the horizon are deleted")
    }
    spark.read
      .schema("version BIGINT, action STRING, file STRING, n_rows BIGINT")
      .option("mode", "FAILFAST")
      .json(s"$root/_txn_log/v*.json")
      .filter(col("version") <= upTo)
      .groupBy(col("file"))
      .agg(max_by(col("action"), struct(col("version"), col("action"))).as("last"))
      .filter(col("last") === "add")
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** The table at version `asOf` — a distributed scan of exactly the
    * live files, schema pinned by the log owner (never inferred).
    */
  def snapshot(spark: SparkSession, root: String, schemaDdl: String,
      asOf: Option[Int] = None): DataFrame =
    spark.read.schema(schemaDdl).parquet(liveFiles(spark, root, asOf): _*)

  /** Highest vacuumed-past horizon, if any vacuum has run. */
  def vacuumHorizon(root: String): Option[Int] = {
    val f = new File(logDir(root), "_vacuum.json")
    if (!f.exists()) None
    else """"horizon":(\d+)""".r
      .findFirstMatchIn(new String(Files.readAllBytes(f.toPath), "UTF-8"))
      .map(_.group(1).toInt)
  }

  /** Retention-bounded physical file GC — the lake twin of the
    * reference's fsck `--older-than` prune (`README:28`): delete every
    * data file unreferenced by ALL retained versions (asOf ≥
    * `horizon`), then record the horizon so time travel below it fails
    * cleanly ([[liveFiles]] guard) instead of scanning missing files.
    *
    * Deletability is one metadata fold over the log, no file listing:
    * per file, its LAST liveness interval is [last add, last remove);
    * any earlier interval ended earlier still, so a file is
    * unreferenced by every version ≥ horizon iff it is currently
    * tombstoned (last remove ≥ last add) AND the tombstone is at or
    * before the horizon (removed at r ⇒ last live at r−1 < horizon ⇔
    * r ≤ horizon). The deletes themselves run distributed
    * (`foreachPartition` on the metadata-scale deletable list — at
    * 100 TB a compaction-heavy table tombstones millions of files; the
    * driver never loops over them). Returns (files deleted, files
    * retained). Idempotent: re-running deletes nothing new and the
    * recorded horizon is monotone.
    */
  def vacuum(spark: SparkSession, root: String, horizon: Int): (Long, Long) = {
    val latest = latestVersion(root)
    require(horizon >= 0 && horizon <= latest,
      s"vacuum horizon $horizon outside committed range [0, $latest]")
    val perFile = spark.read
      .schema("version BIGINT, action STRING, file STRING, n_rows BIGINT")
      .option("mode", "FAILFAST")
      .json(s"$root/_txn_log/v*.json")
      .groupBy(col("file"))
      .agg(
        max(when(col("action") === "add", col("version"))).as("last_add"),
        max(when(col("action") === "remove", col("version"))).as("last_remove"))
    // tombstones at or below a PREVIOUSLY recorded horizon were
    // already deleted by that vacuum — excluding them makes the
    // returned count exact and a re-run a true no-op
    val prevHorizon = vacuumHorizon(root).getOrElse(-1)
    val deletable = perFile.filter(
      col("last_remove").isNotNull &&
        (col("last_add").isNull || col("last_remove") >= col("last_add")) &&
        col("last_remove") <= horizon &&
        col("last_remove") > prevHorizon)
      .select(col("file"))
    val nDeleted = deletable.count()
    // retained = referenced by some version >= horizon (excludes every
    // GC'd tombstone, this run's and earlier runs')
    val nRetained = perFile.filter(
      col("last_remove").isNull || col("last_add") > col("last_remove") ||
        col("last_remove") > horizon).count()
    deletable.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(r.getString(0))
          val _ = p.getFileSystem(conf).delete(p, false)
        }
    }
    val newHorizon = math.max(horizon, vacuumHorizon(root).getOrElse(0))
    Files.write(new File(logDir(root), "_vacuum.json").toPath,
      s"""{"horizon":$newHorizon,"files_deleted":$nDeleted}"""
        .getBytes("UTF-8"))
    (nDeleted, nRetained)
  }

  /** Write a batch under `dir` and report the part files with their
    * row counts (footer metadata, not a data pass at parquet's level —
    * the count aggregate reads only file metadata columns).
    */
  private def writeData(df: DataFrame, dir: String): Seq[Action] = {
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("f")).count()
      .collect()
      .map(r => Action("add", r.getString(0), r.getLong(1)))
      .sortBy(_.file).toSeq
  }

  private val txnSchema = "o_orderkey BIGINT, o_custkey BIGINT, price_c BIGINT, d DATE"

  private val txnRoots = new ConcurrentHashMap[String, String]()

  /** Fixture: three commits over the orders table.
    *   v0  bulk insert of pre-1998 orders (2 files)
    *   v1  bulk insert of the rest (2 files)
    *   v2  compaction — v0's files rewritten as ONE file and removed
    * Memoized per corpus per JVM (the commits are the fixture; the
    * measured query is snapshot resolution + the versioned reads).
    */
  def txnFixture(spark: SparkSession, dir: String): String =
    txnRoots.computeIfAbsent(dir, d => {
      val root = graft.TmpDirs.cleanupOnExit(
        Files.createTempDirectory("graft_txn_log_")).toString
      buildTxnCommits(spark, d, root)
      root
    })

  /** The three-commit fixture body, reusable on a caller-owned root
    * (the vacuum fixture and the byte-identity specs need roots they
    * may mutate without poisoning the memoized [[txnFixture]]).
    */
  def buildTxnCommits(spark: SparkSession, dir: String, root: String): Unit = {
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"),
      Money.cents(col("o_totalprice")).as("price_c"),
      to_date(col("o_orderdate")).as("d"))
    val old = orders.filter(col("d") < lit("1998-01-01").cast("date"))
    commit(root, 0, writeData(old.repartition(2), s"$root/data/b0"))
    commit(root, 1, writeData(
      orders.filter(col("d") >= lit("1998-01-01").cast("date")).repartition(2),
      s"$root/data/b1"))
    // compaction: logically invisible — reads back v0's files through
    // the log, rewrites them as one right-sized file, removes the originals
    val v0Files = liveFiles(spark, root, Some(0))
    val compacted = writeData(
      spark.read.schema(txnSchema).parquet(v0Files: _*).coalesce(1),
      s"$root/data/b2")
    commit(root, 2, compacted ++ v0Files.map(f => Action("remove", f, 0L)))
  }

  private val vacuumRoots = new ConcurrentHashMap[String, String]()

  /** Fixture for [[ioTxnVacuum]]: the same three commits on a private
    * root, vacuumed to retain only the head version — v0's original
    * files (tombstoned by the v2 compaction) are physically deleted.
    */
  def vacuumFixture(spark: SparkSession, dir: String): String =
    vacuumRoots.computeIfAbsent(dir, d => {
      val root = graft.TmpDirs.cleanupOnExit(
        Files.createTempDirectory("graft_txn_vac_")).toString
      buildTxnCommits(spark, d, root)
      val _ = vacuum(spark, root, latestVersion(root))
      root
    })

  /** §2.8 `io_txn_vacuum` — the versioned read surface AFTER a vacuum
    * retaining only the head version: v2 must read exactly what it
    * read before the GC (the oracle recomputes it from the raw table
    * — any wrongly-deleted live file breaks the hash), while v0/v1
    * now fail cleanly at resolution and report as vacuumed rows. The
    * reference twin is fsck `--older-than`: GC bounded by a retention
    * horizon, never touching live data.
    */
  def ioTxnVacuum(spark: SparkSession, dir: String): DataFrame = {
    val root = vacuumFixture(spark, dir)
    (0 to 2).map { v =>
      try
        snapshot(spark, root, txnSchema, Some(v))
          .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_c"),
            max(col("d")).as("last_date"))
          .select(lit(v.toLong).as("version"), lit(false).as("vacuumed"),
            col("n_orders"), Money.dollars(col("sum_c"), 100.0).as("total_price"),
            col("last_date"))
      catch { case _: IllegalStateException =>
        spark.range(1).select(lit(v.toLong).as("version"),
          lit(true).as("vacuumed"),
          lit(null).cast("bigint").as("n_orders"),
          lit(null).cast("double").as("total_price"),
          lit(null).cast("date").as("last_date"))
      }
    }.reduce(_ unionByName _).orderBy(col("version"))
  }

  /** §2.8 `io_txn_log` — the same aggregate read at every version:
    * v0 must equal the pre-1998 slice, v1 the full table, and v2
    * (post-compaction) must be byte-identical to v1 even though the
    * physical file set changed — the oracle recomputes all three from
    * the raw table, so any log-resolution or compaction bug surfaces
    * as a hash mismatch.
    */
  def ioTxnLog(spark: SparkSession, dir: String): DataFrame = {
    val root = txnFixture(spark, dir)
    (0 to 2).map { v =>
      snapshot(spark, root, txnSchema, Some(v))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_c"),
          max(col("d")).as("last_date"))
        .select(lit(v.toLong).as("version"), col("n_orders"),
          Money.dollars(col("sum_c"), 100.0).as("total_price"), col("last_date"))
    }.reduce(_ unionByName _).orderBy(col("version"))
  }

  /** §2.8#282 — snapshot diff (CDC-style time travel): row-level
    * added/removed accounting between consecutive log versions,
    * keyed on the table key. v0→v1 must show exactly the appended
    * 1998 slice; v1→v2 must show ZERO row changes even though the
    * physical file set was rewritten — the row-level statement of
    * the compaction-invisibility invariant (`io_txn_log` checks it
    * only in aggregate). Two left-anti joins per transition on the
    * key column; empty sides coalesce to 0, never null.
    */
  def ioSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val root = txnFixture(spark, dir)
    (0 until 2).map { v =>
      val a = snapshot(spark, root, txnSchema, Some(v))
        .select(col("o_orderkey"), col("price_c"))
      val b = snapshot(spark, root, txnSchema, Some(v + 1))
        .select(col("o_orderkey"), col("price_c"))
      val added = b.join(a.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("rows_added"),
          coalesce(sum(col("price_c")), lit(0L)).as("added_value_c"))
      val removed = a.join(b.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("rows_removed"),
          coalesce(sum(col("price_c")), lit(0L)).as("removed_value_c"))
      added.crossJoin(removed)
        .select(lit(v.toLong).as("from_version"), lit((v + 1).toLong).as("to_version"),
          col("rows_added"), col("added_value_c"),
          col("rows_removed"), col("removed_value_c"))
    }.reduce(_ unionByName _).orderBy(col("from_version"))
  }

  // ---- deletion vectors (merge-on-read) ----

  private val dvRoots = new ConcurrentHashMap[String, String]()

  /** Fixture: orders written once as an immutable 4-file base; the
    * "delete" writes only a (file, row position) sidecar for rows
    * with `o_orderkey % 10 = 0` — data files untouched (the spec pins
    * their modification times). Positions are the parquet scan's
    * physical `_metadata.row_index`, so the vector addresses rows the
    * way a real reader does — no logical re-sort at read time.
    */
  def dvFixture(spark: SparkSession, dir: String): String =
    dvRoots.computeIfAbsent(dir, d => {
      val root = graft.TmpDirs.cleanupOnExit(
        Files.createTempDirectory("graft_dv_")).toString
      Tables.orders(spark, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        Money.cents(col("o_totalprice")).as("price_c"))
        .repartition(4, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/data")
      spark.read.parquet(s"$root/data")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("_metadata.file_path").as("f"),
          col("_metadata.row_index").as("pos"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/dv")
      root
    })

  /** §2.8 `io_delete_vectors` — merge-on-read: scan ⟕̸ vector
    * (broadcast left-anti on (file, position)) surfaces the table
    * with the deleted rows gone; the oracle is the predicate the
    * vector encoded. The vector is O(deleted rows) of metadata — at
    * 100 TB, deleting a billion rows writes MBs and rewrites nothing;
    * compaction ([[ioTxnLog]]) later folds vectors into data files.
    */
  def ioDeleteVectors(spark: SparkSession, dir: String): DataFrame = {
    val root = dvFixture(spark, dir)
    val scan = spark.read.parquet(s"$root/data")
      .select(col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("pos"),
        col("o_orderstatus"), col("price_c"))
    val dv = spark.read.parquet(s"$root/dv")
    scan.join(broadcast(dv), Seq("f", "pos"), "left_anti")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Money.dollars(sum(col("price_c")), 100.0).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  // ---- file-stats data skipping ----

  private val statsRoots = new ConcurrentHashMap[String, String]()

  /** Fixture: lineitem range-clustered into 8 files on `l_shipdate`
    * (repartitionByRange — each file covers a narrow date band), plus
    * a stats manifest (file → min/max shipdate, rows) collected in
    * one metadata-column aggregate at write time.
    */
  def statsFixture(spark: SparkSession, dir: String): String =
    statsRoots.computeIfAbsent(dir, d => {
      val root = graft.TmpDirs.cleanupOnExit(
        Files.createTempDirectory("graft_stats_")).toString
      Tables.lineitem(spark, d).select(
        to_date(col("l_shipdate")).as("ship_d"), col("l_returnflag"),
        Money.cents(col("l_quantity")).as("qty_c"),
        Money.netE4.as("net_e4"))
        .repartitionByRange(8, col("ship_d"))
        .write.mode("overwrite").parquet(s"$root/data")
      spark.read.parquet(s"$root/data")
        .groupBy(col("_metadata.file_path").as("f"))
        .agg(min(col("ship_d")).as("min_d"), max(col("ship_d")).as("max_d"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/manifest")
      root
    })

  /** §2.8 `io_stats_prune_scan` — data skipping: the 1996-H1 query
    * consults the manifest (8 rows) and opens only files whose
    * [min,max] band overlaps the predicate — the spec pins that most
    * files are never read. The residual filter stays on the scan
    * (stats prune files; they don't subsume the predicate). The
    * oracle is the same query over the raw table, so pruning must be
    * exactly lossless.
    */
  def ioStatsPruneScan(spark: SparkSession, dir: String): DataFrame = {
    val root = statsFixture(spark, dir)
    val (lo, hi) = ("1996-01-01", "1996-06-30")
    val pruneSchema = "ship_d DATE, l_returnflag STRING, qty_c BIGINT, net_e4 BIGINT"
    val candidates = spark.read.parquet(s"$root/manifest")
      .filter(col("max_d") >= lit(lo).cast("date") &&
        col("min_d") <= lit(hi).cast("date"))
      .select(col("f")).collect().map(_.getString(0)).sorted
    // a predicate overlapping NO stats band is an empty result, not a
    // read error — a real data-skipping scan opens zero files
    val base =
      if (candidates.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(pruneSchema))
      else spark.read.schema(pruneSchema).parquet(candidates: _*)
    base
      .filter(col("ship_d").between(lit(lo).cast("date"), lit(hi).cast("date")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty_c")).as("sum_qty_c"),
        Money.dollars(sum(col("net_e4")), 1e4).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Total vs pruned file counts for [[ioStatsPruneScan]]'s band —
    * spec surface (file counts depend on range-partitioner sampling,
    * so they stay out of the oracle-hashed output).
    */
  def statsPruneCounts(spark: SparkSession, dir: String): (Long, Long) = {
    val root = statsFixture(spark, dir)
    val man = spark.read.parquet(s"$root/manifest")
    val total = man.count()
    val hit = man.filter(col("max_d") >= lit("1996-01-01").cast("date") &&
      col("min_d") <= lit("1996-06-30").cast("date")).count()
    (total, hit)
  }

  // ---- Bloom / NDV stats audit ----

  /** §2.8 `io_stats_prune_bloom` — the row-group-level Bloom + NDV
    * audit twin of [[ioStatsPruneScan]]: min/max footer stats prune
    * RANGE predicates on the clustering column, but are near-useless
    * for POINT lookups on a column uncorrelated with the layout
    * (every file's [min,max] spans the whole key domain). Real lake
    * formats add per-file Bloom filters and NDV counts for exactly
    * this; this op measures what they buy, with everything exact and
    * oracle-reproducible.
    *
    * Layout: 16 synthetic range files on ship-date (the file id is a
    * pure function of the data — `(datediff from min × 16) div
    * (span+1)` — so the oracle rebuilds the identical layout; actual
    * `repartitionByRange` boundaries depend on sampling and could
    * not be mirrored). Per file: min/max/NDV of `l_orderkey` and a
    * 2^16-bit Bloom over the file's distinct orderkeys, k=2 hash
    * positions read straight off md5 hex prefixes (4 nibbles each, no
    * hex→int conversion — the [[graft.dedup.Dedup.dedupSimhash]]
    * portability discipline). The filter is stored as the SET of set
    * bit positions, ≤ 2·NDV small rows per file — at 100 TB these are
    * KBs of metadata per file, the same "metadata describes data"
    * shape as the txn log (reference anchor: the manifest that
    * `Uploader._writeManifest` keeps per directory,
    * `bin/cassandra-syncer:215-226`).
    *
    * Probes: a bounded orderkey slice (`% 997 == 1 AND < 100000` —
    * ≤101 probes at ANY scale, the [[graft.similarity.Pq.AdcProbeCap]]
    * discipline). Per probe-bucket readout: files admitted by min/max
    * alone, by min/max+Bloom, and truly containing the key, plus the
    * row counts those admissions would scan — every column an exact
    * integer, so engine parity is trivially bit-level. Invariant
    * (spec-pinned): true ⊆ bloom ⊆ minmax row by row — a Bloom has
    * false positives, never false negatives. Saturation is part of
    * the readout: as per-file NDV approaches the 2^16 bit budget the
    * bloom column converges to the minmax column, which is exactly
    * the sizing signal a table-format maintainer needs.
    *
    * Scale: one map-side-combined groupBy collapses the fact table to
    * (file, key) cells; stats and bloom rows aggregate those cells;
    * the probe×file grid is ≤ 101×16 broadcast rows. Nothing
    * quadratic, nothing collected.
    */
  def ioStatsPruneBloom(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(to_date(col("l_shipdate")).as("d"), col("l_orderkey").as("ok"))
    val bounds = li.agg(min(col("d")).as("mn"),
      datediff(max(col("d")), min(col("d"))).as("span"))
    val filed = li.crossJoin(broadcast(bounds))
      .select(expr("CAST((datediff(d, mn) * 16) div (span + 1) AS BIGINT)").as("f"),
        col("ok"))
    // (file, key) cells: truth set, NDV base, and per-key row counts.
    // The cut is measured, not assumed: without it the three consumers
    // (stats, bloom, truth probe) re-derive the fact-table collapse —
    // post-optimizer their subtrees diverge enough that exchange reuse
    // does NOT kick in (measured 15.6 s no-cut vs 8.9 s cut at sf1).
    val pk = filed.groupBy(col("f"), col("ok"))
      .agg(count(lit(1)).as("n_rows_key"))
      .cutLineage() // feeds stats, bloom, truth — computed once
    val st = pk.groupBy(col("f"))
      .agg(min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"),
        count(lit(1)).as("ndv"), sum(col("n_rows_key")).as("n_rows"))
    def pos(k: Column, seed: String): Column =
      substring(md5(concat(k.cast("string"), lit(s"|$seed"))), 1, 4)
    val bb = pk.select(col("f"),
        explode(array(pos(col("ok"), "1"), pos(col("ok"), "2"))).as("pos"))
      .distinct()
    val probes = li.filter(col("ok") % 997 === 1 && col("ok") < 100000)
      .select(col("ok")).distinct()
    val grid = probes.crossJoin(st)
      .withColumn("p1", pos(col("ok"), "1"))
      .withColumn("p2", pos(col("ok"), "2"))
    val flagged = grid
      .join(bb.select(col("f"), col("pos").as("p1"), lit(1L).as("h1")),
        Seq("f", "p1"), "left")
      .join(bb.select(col("f"), col("pos").as("p2"), lit(1L).as("h2")),
        Seq("f", "p2"), "left")
      .join(pk.select(col("f"), col("ok"), lit(1L).as("present")),
        Seq("f", "ok"), "left")
      .withColumn("amm", col("ok").between(col("min_ok"), col("max_ok")))
      .withColumn("abloom",
        col("amm") && col("h1").isNotNull && col("h2").isNotNull)
    flagged.groupBy((col("ok") % 7).as("probe_bucket"))
      .agg(countDistinct(col("ok")).as("n_probes"),
        sum(when(col("amm"), 1L).otherwise(0L)).as("minmax_file_admits"),
        sum(when(col("abloom"), 1L).otherwise(0L)).as("bloom_file_admits"),
        sum(when(col("present").isNotNull, 1L).otherwise(0L)).as("true_file_hits"),
        sum(when(col("amm"), col("n_rows")).otherwise(0L)).as("minmax_rows_scanned"),
        sum(when(col("abloom"), col("n_rows")).otherwise(0L)).as("bloom_rows_scanned"))
      .orderBy(col("probe_bucket"))
  }

  /** DuckDB oracle for [[ioStatsPruneBloom]] — the identical
    * deterministic layout, md5-prefix bloom, and probe grid.
    */
  def statsPruneBloomOracleSql: String =
    """WITH li AS (SELECT CAST(l_shipdate AS DATE) AS d, l_orderkey AS ok
      |    FROM lineitem),
      |b AS (SELECT min(d) AS mn,
      |    date_diff('day', min(d), max(d)) AS span FROM li),
      |fd AS (SELECT CAST((date_diff('day', mn, d) * 16) // (span + 1) AS BIGINT) AS f,
      |    ok FROM li, b),
      |pk AS (SELECT f, ok, count(*) AS n_rows_key FROM fd GROUP BY 1, 2),
      |st AS (SELECT f, min(ok) AS min_ok, max(ok) AS max_ok,
      |    count(*) AS ndv, CAST(sum(n_rows_key) AS BIGINT) AS n_rows
      |  FROM pk GROUP BY 1),
      |bb AS (SELECT DISTINCT f, pos FROM (
      |    SELECT f, substr(md5(CAST(ok AS VARCHAR) || '|1'), 1, 4) AS pos FROM pk
      |    UNION ALL
      |    SELECT f, substr(md5(CAST(ok AS VARCHAR) || '|2'), 1, 4) FROM pk)),
      |pr AS (SELECT DISTINCT ok FROM li WHERE ok % 997 = 1 AND ok < 100000),
      |grid AS (SELECT pr.ok, st.f, st.min_ok, st.max_ok, st.n_rows,
      |    substr(md5(CAST(pr.ok AS VARCHAR) || '|1'), 1, 4) AS p1,
      |    substr(md5(CAST(pr.ok AS VARCHAR) || '|2'), 1, 4) AS p2
      |  FROM pr, st),
      |fl AS (SELECT grid.ok, grid.n_rows,
      |    (grid.ok BETWEEN grid.min_ok AND grid.max_ok) AS amm,
      |    ((grid.ok BETWEEN grid.min_ok AND grid.max_ok)
      |      AND b1.pos IS NOT NULL AND b2.pos IS NOT NULL) AS abloom,
      |    (p.ok IS NOT NULL) AS tru
      |  FROM grid
      |  LEFT JOIN bb b1 ON b1.f = grid.f AND b1.pos = grid.p1
      |  LEFT JOIN bb b2 ON b2.f = grid.f AND b2.pos = grid.p2
      |  LEFT JOIN pk p ON p.f = grid.f AND p.ok = grid.ok)
      |SELECT ok % 7 AS probe_bucket, count(DISTINCT ok) AS n_probes,
      |  CAST(sum(CASE WHEN amm THEN 1 ELSE 0 END) AS BIGINT) AS minmax_file_admits,
      |  CAST(sum(CASE WHEN abloom THEN 1 ELSE 0 END) AS BIGINT) AS bloom_file_admits,
      |  CAST(sum(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT) AS true_file_hits,
      |  CAST(sum(CASE WHEN amm THEN n_rows ELSE 0 END) AS BIGINT) AS minmax_rows_scanned,
      |  CAST(sum(CASE WHEN abloom THEN n_rows ELSE 0 END) AS BIGINT) AS bloom_rows_scanned
      |FROM fl GROUP BY 1 ORDER BY probe_bucket""".stripMargin
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.syncer.BackupPipeline

/** Command-line entry point — the analogue of the reference CLI
  * (`cassandra-syncer --path <dir> --config <json> <target-url>` and
  * `cassandra-syncer-restore`), driving the same workflows as Spark
  * jobs:
  *
  * {{{
  *   runMain graft.tools.GraftCli backup  --data <dir> --target <url>
  *   runMain graft.tools.GraftCli restore --target <url> [--as-of 2024-01-15]
  *   runMain graft.tools.GraftCli prune   --target <url> [--cutoff 2024-01-20]
  *   runMain graft.tools.GraftCli fsck    --target <url> [--older-than 21 [--apply true]]
  *   runMain graft.tools.GraftCli query   --data <dir> --name <registry-key>
  *   runMain graft.tools.GraftCli list
  *   runMain graft.tools.GraftCli <cmd>   --config contrib/config.json.example
  * }}}
  *
  * `--config` points at a flat JSON object (see
  * `contrib/config.json.example`, mirroring the reference's config
  * file); explicit flags override config values.
  */
object GraftCli {

  private def parseFlags(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  /** Minimal flat-JSON parse ("key": "value" / "key": 123) — enough
    * for the reference-shaped config file without a JSON dependency.
    */
  private[graft] def parseConfig(text: String): Map[String, String] = {
    val kv = "\"([^\"]+)\"\\s*:\\s*(?:\"([^\"]*)\"|([-0-9.]+))".r
    kv.findAllMatchIn(text).map { m =>
      m.group(1) -> Option(m.group(2)).getOrElse(m.group(3))
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val flags = parseFlags(args.tail)
    val fromConfig = flags.get("config")
      .map(p => parseConfig(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")))
      .getOrElse(Map.empty)
    val opts = fromConfig ++ (flags - "config")
    def req(k: String): String = opts.getOrElse(k,
      { System.err.println(s"missing --$k"); usage(); sys.exit(2) })

    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        opts.getOrElse("shuffle_partitions", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      cmd match {
        case "backup" =>
          val target = BackupPipeline.backup(spark, req("data"), req("target"))
          println(s"backup complete: objects=${target.objectsPath} " +
            s"manifests=${target.manifestsPath}")
        case "restore" =>
          val asOf = opts.getOrElse("as-of", "2024-01-15")
          opts.get("dest") match {
            case Some(dest) =>
              // resumable fetch: progress lands in the target's
              // restore ledger, so a re-run (after a crash or a
              // bounded --max-files pass) fetches only the remainder
              val maxFiles = opts.get("max-files").map(_.toInt)
              val fetched = BackupPipeline.runRestorePass(
                spark, req("target"), asOf, dest, maxFiles)
              val left = BackupPipeline.restoreRemainder(
                spark, req("target"), asOf).count()
              println(s"restore pass as of $asOf: fetched ${fetched.count()} " +
                s"files to $dest, $left remaining")
            case None =>
              val rs = BackupPipeline.restoreSet(spark, req("target"), asOf)
              println(s"restore set as of $asOf: ${rs.count()} files")
              rs.show(20, truncate = false)
          }
        case "prune" =>
          val cutoff = opts.getOrElse("cutoff", "2024-01-20")
          val plan = BackupPipeline.prunePlan(spark, req("target"), cutoff)
          println(s"prunable before $cutoff: ${plan.count()} files")
          plan.show(20, truncate = false)
        case "watch" =>
          // the reference daemon: catch up on everything already on
          // disk (first micro-batch over a fresh checkpoint IS the
          // initial full backup), then keep watching for new files.
          // --data takes a comma-separated root list, mirroring the
          // reference's repeatable --path
          val roots = req("data").split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val targetUrl = req("target")
          val ckpt = opts.get("checkpoint")
          if (opts.get("once").contains("true")) {
            graft.streaming.WatchService.runOnceAll(spark, roots, targetUrl, ckpt)
            val m = graft.streaming.WatchService.manifest(spark, targetUrl)
            println(s"watch pass complete: ${m.count()} files in manifest")
          } else {
            val interval = opts.getOrElse("interval", "10 seconds")
            val q = graft.streaming.WatchService.startAll(spark, roots, targetUrl,
              org.apache.spark.sql.streaming.Trigger.ProcessingTime(interval), ckpt)
            println(s"watching ${roots.mkString(",")} -> $targetUrl every $interval (ctrl-c to stop)")
            q.awaitTermination()
          }
        case "fsck" =>
          // the reference's composed utility (README:28): verify every
          // stored object against its manifest digest, then (with
          // --older-than N) plan/apply the prune of unreferenced
          // objects older than N days. Exit 1 if any object fails
          // verification — scriptable like the reference CLI.
          import org.apache.spark.sql.functions.{col, sum => sqlSum}
          val targetUrl = req("target")
          val ws = graft.streaming.WatchService
          val report = ws.fsckVerify(spark, targetUrl)
          val counts = report.groupBy(col("fsck_status")).count().collect()
            .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
          println(s"fsck verify: " +
            (if (counts.isEmpty) "empty manifest" else counts.mkString(" ")))
          val bad = report.filter(col("fsck_status") =!= "ok")
          val nBad = bad.count()
          if (nBad > 0) bad.show(20, truncate = false)
          opts.get("older-than").foreach { days =>
            val asOfMs = opts.get("as-of")
              .map(d => java.time.LocalDate.parse(d)
                .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
              .getOrElse(System.currentTimeMillis())
            val plan = ws.fsckPrunePlan(spark, targetUrl, days.toInt, asOfMs)
            val stats = plan.agg(
              org.apache.spark.sql.functions.count(col("path")).as("n"),
              org.apache.spark.sql.functions.coalesce(
                sqlSum(col("size_bytes")),
                org.apache.spark.sql.functions.lit(0L)).as("b")).first()
            println(s"prunable older than $days days: ${stats.getLong(0)} " +
              s"objects, ${stats.getLong(1)} bytes")
            plan.show(20, truncate = false)
            if (opts.get("apply").contains("true")) {
              val n = ws.fsckPruneApply(spark, targetUrl, plan)
              println(s"pruned $n objects")
            }
          }
          if (nBad > 0) { spark.stop(); sys.exit(1) }
        case "query" =>
          val name = req("name")
          graft.SparkEntry.queries.get(name) match {
            case Some(fn) => fn(spark, req("data")).show(20, truncate = false)
            case None =>
              System.err.println(s"unknown query '$name' — try `list`"); sys.exit(2)
          }
        case "explain" =>
          val name = req("name")
          graft.SparkEntry.queries.get(name) match {
            case Some(fn) =>
              val df = fn(spark, req("data"))
              // run once so AQE finalizes the real plan (reused
              // exchanges, runtime join strategies), then print it
              df.write.format("noop").mode("overwrite").save()
              println(df.queryExecution.executedPlan.toString)
            case None =>
              System.err.println(s"unknown query '$name' — try `list`"); sys.exit(2)
          }
        case "list" =>
          graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
        case other =>
          System.err.println(s"unknown command '$other'"); usage(); sys.exit(2)
      }
    } finally spark.stop()
  }

  private def usage(): Unit = System.err.println(
    """usage: GraftCli <backup|watch|restore|prune|fsck|query|explain|list> [--config <json>]
      |  backup  --data <dir> --target <directory://...|objectstore://bucket>
      |  watch   --data <dir>[,<dir>...] --target <url> [--interval '10 seconds'] [--once true]
      |  restore --target <url> [--as-of YYYY-MM-DD] [--dest <dir> [--max-files N]]
      |  prune   --target <url> [--cutoff YYYY-MM-DD]
      |  fsck    --target <url> [--older-than <days> [--as-of YYYY-MM-DD] [--apply true]]
      |  query   --data <dir> --name <registry-key>""".stripMargin)
}

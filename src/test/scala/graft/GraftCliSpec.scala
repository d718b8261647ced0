package graft

import graft.tools.GraftCli

/** The CLI's flat-JSON config parse (no JSON dependency available —
  * it must handle the reference-shaped config file).
  */
class GraftCliSpec extends GraftSpec {

  test("parses the shipped example config") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("contrib/config.json.example")), "UTF-8")
    val cfg = GraftCli.parseConfig(text)
    assert(cfg("data") === "/root/testdata/sf0.001")
    assert(cfg("target") === "directory:///tmp/graft-backup")
    assert(cfg("as-of") === "2024-01-15")
    assert(cfg("shuffle_partitions") === "32")
  }

  test("parses string and numeric values; ignores malformed lines") {
    val cfg = GraftCli.parseConfig(
      """{"a": "x", "n": 42, "f": 2.5, broken, "b": "y"}""")
    assert(cfg === Map("a" -> "x", "n" -> "42", "f" -> "2.5", "b" -> "y"))
  }

  test("fsck verb over mockos://: verify ok, orphan-only older-than prune, apply deletes") {
    import org.apache.hadoop.fs.Path
    import graft.streaming.WatchService
    import graft.syncer.Target
    graft.sources.MockObjectStoreFs.register(spark)
    val prev = sys.props.get("graft.objectstore.scheme")
    sys.props.put("graft.objectstore.scheme", "mockos")
    try {
      val data = java.nio.file.Files.createTempDirectory("graft-fsck-data")
      java.nio.file.Files.write(data.resolve("na-1-Data.db"), "hello".getBytes("UTF-8"))
      java.nio.file.Files.write(data.resolve("na-2-Data.db"), "world!".getBytes("UTF-8"))
      val url = "objectstore://bucket-fsck-r14"
      WatchService.runOnceAll(spark, Seq(data.toString), url)
      // verify half: both uploads re-hash clean through the mock store
      val report = WatchService.fsckVerify(spark, url).collect()
      assert(report.length === 2)
      assert(report.forall(_.getAs[String]("fsck_status") == "ok"),
        report.mkString("; "))
      // prune half: plant an orphan (a partial upload the manifest
      // never recorded) with a 30-day-old mtime, and age a REFERENCED
      // object even older — only the orphan may be planned
      val objectsPath = Target.parse(url).objectsPath
      val fs = new Path(objectsPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val orphan = new Path(objectsPath, "stray/partial-upload.tmp")
      val out = fs.create(orphan, true)
      out.write("junk".getBytes("UTF-8")); out.close()
      val now = System.currentTimeMillis()
      fs.setTimes(orphan, now - 30L * 86400000L, -1)
      fs.setTimes(new Path(objectsPath, report.head.getAs[String]("path")),
        now - 40L * 86400000L, -1)
      val plan = WatchService.fsckPrunePlan(spark, url, 21, now)
      assert(plan.collect().map(_.getString(0)).toSeq ===
        Seq("stray/partial-upload.tmp"),
        "only the unreferenced object may be pruned, however old the referenced ones are")
      // a fresh orphan (mtime now) survives the retention window
      assert(WatchService.fsckPrunePlan(spark, url, 21,
        now - 20L * 86400000L).count() === 0)
      // apply: the orphan is gone, the plan drains, uploads still verify
      assert(WatchService.fsckPruneApply(spark, url,
        WatchService.fsckPrunePlan(spark, url, 21, now)) === 1L)
      assert(!fs.exists(orphan))
      assert(WatchService.fsckPrunePlan(spark, url, 21, now).count() === 0)
      assert(WatchService.fsckVerify(spark, url).collect()
        .forall(_.getAs[String]("fsck_status") == "ok"))
    } finally {
      sys.props.remove("graft.objectstore.scheme")
      prev.foreach(v => sys.props.put("graft.objectstore.scheme", v))
    }
  }
}

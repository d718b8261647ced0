package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.WatchService
import graft.syncer.Target

/** Crash-recovery coverage for the COMPOSED dedup-gated watch
  * pipeline (`sync_watch_dedup`, WatchService.dedupGatedBatch): the
  * r12 VERDICT's dual-write gap. The per-batch body performs the
  * side-effecting copy plus TWO metadata writes (verdict manifest,
  * then index append); a daemon killed after the manifest write but
  * before the index write leaves a torn `bid_k` on disk with the
  * offsets log uncommitted. On restart the engine replays the same
  * batch id; the `bid_<batchId>` overwrite protocol plus the
  * own-subdir exclusion in the index probe must make the retry heal
  * the tear and reproduce exactly the verdicts an uncrashed run
  * would have produced. Runs under both state-store providers for
  * symmetry with CheckpointResumeSpec (the gate itself is stateless
  * foreachBatch; the provider governs the engine's bookkeeping).
  */
class WatchDedupCrashSpec extends GraftSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def put(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  Seq("HDFS-backed" -> Option.empty[String], "RocksDB" -> Some(RocksDb))
    .foreach { case (pname, provider) =>

    test(s"dedup gate heals a crash between manifest and index writes ($pname)") {
      val src = Files.createTempDirectory("graft_wdc_src_")
      val tgt = Files.createTempDirectory("graft_wdc_tgt_").toString
      val ckpt = Files.createTempDirectory("graft_wdc_ckpt_").toString
      val url = s"directory://$tgt"
      val target = Target.parse(url)
      val session = spark.newSession()
      session.conf.set("spark.sql.shuffle.partitions", "8")
      provider.foreach(session.conf.set(ProviderKey, _))

      // batch 0: two distinct contents, committed cleanly
      put(src, "ks1/cf1/node1/na-1-Data.db", "AAA")
      put(src, "ks1/cf1/node2/na-2-Data.db", "BBB")
      WatchService.runOnceDedupGated(session, Seq(src.toString), url, Some(ckpt))

      // batch 1 arrivals: a cross-batch duplicate of AAA plus an
      // intra-batch duplicated new content CCC
      put(src, "ks1/cf2/node1/na-3-Data.db", "AAA")
      put(src, "ks1/cf2/node1/na-4-Data.db", "CCC")
      put(src, "ks1/cf2/node2/na-5-Data.db", "CCC")

      // simulate the doomed first attempt of batch 1: the engine's
      // next batch id is 1 (batch 0 committed). Run the batch body
      // directly — copies happen, manifest bid_1 lands, index bid_1
      // lands — then TEAR the dual write by deleting the index side
      // and leaving the offsets log uncommitted (the body ran outside
      // the engine, so the checkpoint never saw batch 1).
      val arrivals = Seq(
        ("na-3-Data.db", "ks1/cf2/node1/na-3-Data.db"),
        ("na-4-Data.db", "ks1/cf2/node1/na-4-Data.db"),
        ("na-5-Data.db", "ks1/cf2/node2/na-5-Data.db")).map { case (_, rel) =>
        val p = src.resolve(rel)
        (s"file:${p.toString}", Files.size(p))
      }
      import session.implicits._
      val batchDf = arrivals.toDF("path", "length")
      WatchService.dedupGatedBatch(batchDf, Seq(src.toString), target, 1L)
      deleteRec(Paths.get(target.dedupIndexPath, "bid_1"))
      assert(Files.exists(Paths.get(target.dedupManifestsPath, "bid_1")),
        "torn state: manifest committed")
      assert(!Files.exists(Paths.get(target.dedupIndexPath, "bid_1")),
        "torn state: index lost")

      // restart on the same checkpoint: the engine replays the three
      // files as batch 1 and the retry must heal the tear
      WatchService.runOnceDedupGated(session, Seq(src.toString), url, Some(ckpt))

      val manifest = WatchService.dedupManifest(session, url).collect()
      val byPath = manifest.map(r => r.getString(0) -> r).toMap
      def verdict(rel: String): String = byPath(rel).getString(3)
      def keeper(rel: String): String = byPath(rel).getString(4)
      assert(manifest.length === 5, "one verdict row per arrival, no ghosts")
      assert(verdict("ks1/cf1/node1/na-1-Data.db") === "accepted")
      assert(verdict("ks1/cf1/node2/na-2-Data.db") === "accepted")
      assert(verdict("ks1/cf2/node1/na-3-Data.db") === "duplicate")
      assert(keeper("ks1/cf2/node1/na-3-Data.db") === "ks1/cf1/node1/na-1-Data.db",
        "cross-batch duplicate names the INDEX keeper, not a batch keeper")
      assert(verdict("ks1/cf2/node1/na-4-Data.db") === "accepted",
        "min-path rule picks na-4 among the CCC group")
      assert(verdict("ks1/cf2/node2/na-5-Data.db") === "duplicate")
      assert(keeper("ks1/cf2/node2/na-5-Data.db") === "ks1/cf2/node1/na-4-Data.db")

      // the healed index: every digest accepted exactly once globally
      val idx = session.read
        .option("recursiveFileLookup", "true")
        .parquet(target.dedupIndexPath)
        .toDF("digest", "keeper_path").collect()
      assert(idx.length === 3, "AAA, BBB, CCC — one keeper each")
      assert(idx.map(_.getString(0)).distinct.length === 3,
        "no digest accepted twice across batches")

      // object store: keepers present, duplicates never copied...
      val objRoot = Paths.get(target.objectsPath)
      assert(Files.exists(objRoot.resolve("ks1/cf1/node1/na-1-Data.db")))
      assert(Files.exists(objRoot.resolve("ks1/cf2/node1/na-4-Data.db")))
      assert(!Files.exists(objRoot.resolve("ks1/cf2/node2/na-5-Data.db")),
        "intra-batch duplicate never copied")
      // ...except the torn attempt's own copies, which the retry
      // overwrites byte-identically (idempotent by construction)
      assert(Files.readAllBytes(objRoot.resolve("ks1/cf2/node1/na-4-Data.db"))
        .sameElements("CCC".getBytes("UTF-8")))
    }
  }
}

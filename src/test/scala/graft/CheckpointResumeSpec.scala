package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamWatcher

/** Checkpoint RESUME coverage (round-9): StateStoreProviderSpec
  * proves provider parity within ONE uninterrupted run; this spec
  * kills a stateful query mid-replay — after batch k of n, with
  * per-file micro-batches — and restarts the same pipeline on the
  * same checkpoint, asserting the final result equals the
  * uninterrupted replay. That is the daemon's actual failure mode
  * (the reference watcher dies and is restarted by an init system;
  * `sync_watch_service` covers the file-source side, this covers the
  * stateful-operator side): offset log + state store must hand the
  * restarted query exactly the state the dead one had committed.
  * Runs under BOTH state-store providers.
  */
class CheckpointResumeSpec extends GraftSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** RAM-backed scratch root when available (throwaway checkpoints). */
  private def scratch(prefix: String): String = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm))
      Files.createTempDirectory(shm, prefix).toString
    else Files.createTempDirectory(prefix).toString
  }

  /** The events table split into three chronological generations,
    * one parquet file each, mtimes pinned so the file source always
    * processes them oldest-first. Built once per JVM.
    */
  private lazy val generations: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft_resume_gen_")
    val ev = graft.sources.Tables.events(spark, sf)
    val n = ev.count()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))
    val bucketed = ev.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("bucket",
        when(col("rn") * 3 <= n, 1).when(col("rn") * 3 <= n * 2, 2).otherwise(3))
    (1 to 3).map { b =>
      val tmp = Files.createTempDirectory("graft_resume_part_")
      bucketed.filter(col("bucket") === b).drop("rn", "bucket")
        .coalesce(1).write.parquet(s"$tmp/out")
      val pf = Files.list(Paths.get(s"$tmp/out")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      val dest = base.resolve(s"gen_$b.parquet")
      Files.move(pf, dest)
      dest.toFile.setLastModified(60000L * b)
      dest.toString
    }
  }

  private def fixtureStream(session: SparkSession, srcDir: String): DataFrame = {
    val schema = spark.read.parquet(generations.head).schema
    val raw = session.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }

  /** Run `pipeline` over the files currently in `srcDir` to
    * completion, appending every micro-batch to `outDir` parquet, on
    * an isolated session clone with `provider`; returns after stop().
    */
  private def runSegment(srcDir: String, checkpoint: String, outDir: String,
      mode: String, provider: Option[String],
      pipeline: DataFrame => Dataset[_]): Unit = {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    provider.foreach(session.conf.set(ProviderKey, _))
    val sink: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => batch.write.mode("append").parquet(outDir)
    val q = pipeline(fixtureStream(session, srcDir)).toDF().writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Interrupted-vs-one-shot harness: the interrupted run sees
    * generations 1..k, is STOPPED, gains the rest, and restarts on
    * the SAME checkpoint; the one-shot run sees everything from the
    * start with a fresh checkpoint. Returns (interrupted, oneShot)
    * row multisets after `finalize` collapses sink appends to final
    * results.
    */
  private def interruptedVsOneShot(mode: String, provider: Option[String],
      pipeline: DataFrame => Dataset[_],
      finalizeSql: DataFrame => DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    def copyIn(dir: String, gens: Seq[String]): Unit = gens.foreach { g =>
      val dst = Paths.get(dir, Paths.get(g).getFileName.toString)
      Files.copy(Paths.get(g), dst)
      // preserve the pinned ordering for the file source
      dst.toFile.setLastModified(Paths.get(g).toFile.lastModified())
    }
    // interrupted: two segments on one checkpoint
    val srcA = Files.createTempDirectory("graft_resume_srcA_").toString
    val cpA = scratch("graft_resume_cpA_")
    val outA = Files.createTempDirectory("graft_resume_outA_").toString
    copyIn(srcA, generations.take(2))
    runSegment(srcA, cpA, outA, mode, provider, pipeline)
    copyIn(srcA, generations.drop(2))
    runSegment(srcA, cpA, outA, mode, provider, pipeline)
    // one-shot: everything, fresh checkpoint
    val srcB = Files.createTempDirectory("graft_resume_srcB_").toString
    val cpB = scratch("graft_resume_cpB_")
    val outB = Files.createTempDirectory("graft_resume_outB_").toString
    copyIn(srcB, generations)
    runSegment(srcB, cpB, outB, mode, provider, pipeline)
    def readOut(d: String): Seq[Seq[Any]] =
      finalizeSql(spark.read.parquet(d)).collect().map(_.toSeq.toSeq).toSeq
    (readOut(outA), readOut(outB))
  }

  private val providers: Seq[(String, Option[String])] =
    Seq("HDFS-backed" -> None, "RocksDB" -> Some(RocksDb))

  providers.foreach { case (pname, provider) =>
    test(s"mapGroupsWithState retry queue resumes from checkpoint mid-replay ($pname)") {
      // final status per path: the row with the highest attempt count
      // (attempts are monotone across updates)
      def finalize(df: DataFrame): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("path")).orderBy(col("attempts").desc)
        df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("path"), col("attempts"), col("status"))
          .orderBy(col("path"))
      }
      val (resumed, oneShot) = interruptedVsOneShot("update", provider,
        s => StreamWatcher.retryQueueStream(s), finalize)
      assert(resumed.nonEmpty)
      assert(resumed === oneShot,
        "resumed retry-queue state diverged from the uninterrupted replay")
    }

    test(s"stream-stream interval join resumes from checkpoint mid-replay ($pname)") {
      // inner interval join: every emitted match is emitted exactly
      // once; the union of the two segments must equal the one-shot
      // emission set
      def pipeline(stream: DataFrame): Dataset[_] = {
        val purchases = stream.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val clicks = stream.sparkSession.readStream
          .schema(spark.read.parquet(generations.head).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stream.sparkSession.conf.get("graft.resume.src"))
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        purchases.join(clicks, expr(
            "user_id = c_user AND c_ts >= p_ts - interval 30 minutes AND c_ts <= p_ts"))
          .select(col("user_id"), col("purchase_id"), col("click_id"))
      }
      def finalize(df: DataFrame): DataFrame =
        df.orderBy(col("user_id"), col("purchase_id"), col("click_id"))
      // the join needs the source dir visible inside the pipeline fn —
      // smuggle it through the session conf set by runSegment's caller
      def pipelineWithConf(srcDirHolder: Array[String])(s: DataFrame): Dataset[_] = {
        s.sparkSession.conf.set("graft.resume.src", srcDirHolder(0))
        pipeline(s)
      }
      // replicate interruptedVsOneShot with the src dir threaded
      def copyIn(dir: String, gens: Seq[String]): Unit = gens.foreach { g =>
        val dst = Paths.get(dir, Paths.get(g).getFileName.toString)
        Files.copy(Paths.get(g), dst)
        dst.toFile.setLastModified(Paths.get(g).toFile.lastModified())
      }
      val srcA = Files.createTempDirectory("graft_resume_jsrcA_").toString
      val cpA = scratch("graft_resume_jcpA_")
      val outA = Files.createTempDirectory("graft_resume_joutA_").toString
      val holderA = Array(srcA)
      copyIn(srcA, generations.take(2))
      runSegment(srcA, cpA, outA, "append", provider, pipelineWithConf(holderA))
      copyIn(srcA, generations.drop(2))
      runSegment(srcA, cpA, outA, "append", provider, pipelineWithConf(holderA))
      val srcB = Files.createTempDirectory("graft_resume_jsrcB_").toString
      val cpB = scratch("graft_resume_jcpB_")
      val outB = Files.createTempDirectory("graft_resume_joutB_").toString
      val holderB = Array(srcB)
      copyIn(srcB, generations)
      runSegment(srcB, cpB, outB, "append", provider, pipelineWithConf(holderB))
      val resumed = finalize(spark.read.parquet(outA)).collect().map(_.toSeq).toSeq
      val oneShot = finalize(spark.read.parquet(outB)).collect().map(_.toSeq).toSeq
      assert(resumed.nonEmpty)
      assert(resumed === oneShot,
        "resumed interval-join emissions diverged from the uninterrupted replay")
    }
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Microbatch-geometry probe for the streaming bench entries: runs st5
  * (session windows) and st6 (stream-stream interval join) over a tier with
  * a noop sink and dumps per-batch progress — batch count, per-batch input
  * rows, durationMs breakdown (addBatch / getBatch / commitOffsets /
  * walCommit), and state-operator metrics — so a low events/s figure is
  * attributable to per-batch fixed cost vs state growth vs data volume.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> [st5|st6 ...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet else Set("st5", "st6")
    val spark = graft.core.Engine.session("stream-probe", dataDir = Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    // match the bench's streaming geometry (SPARK_GRAFT_SHUFFLE overrides
    // via Engine.session already; otherwise apply the streaming policy)
    if (sys.env.get("SPARK_GRAFT_SHUFFLE").isEmpty)
      spark.conf.set("spark.sql.shuffle.partitions",
        graft.core.Engine.streamShuffleWidth(sfDir,
          spark.sparkContext.defaultParallelism))
    println(s"shuffle.partitions=${spark.conf.get("spark.sql.shuffle.partitions")}")
    // r16 A/B hooks: RocksDB SST/changelog compression codec and changelog
    // checkpointing toggle (VERDICT #4 — state-commit cost at the RocksDB
    // tier). Session-conf sets are picked up at stream start.
    sys.env.get("SPARK_GRAFT_ROCKSDB_COMPRESSION").foreach(c =>
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compression", c))
    sys.env.get("SPARK_GRAFT_CHANGELOG").foreach(c =>
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", c))
    println(s"stateStore=${spark.conf.get("spark.sql.streaming.stateStore.providerClass")}")

    val defs: Seq[(String, () => DataFrame)] = Seq(
      "st5" -> (() => EventStream.sessionWindowStats(EventStream.readStream(spark, sfDir))),
      "st6" -> (() => EventStream.sameUserRecentPairs(
        EventStream.readStream(spark, sfDir), EventStream.readStream(spark, sfDir))))

    defs.filter(d => which(d._1)).foreach { case (name, build) =>
      val t0 = System.nanoTime()
      val q = build().writeStream.format("noop").outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name wall=$wall%.2fs batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        val state = Option(p.stateOperators).getOrElse(Array.empty).map { s =>
          s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"removed=${s.numRowsRemoved} commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes}"
        }.mkString(" | ")
        println(s"  batch=${p.batchId} inputRows=${p.numInputRows} " +
          s"durations=$d state: $state")
      }
    }
    spark.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.streaming.EventStream

/** The events `ts` column has shipped in two physical parquet encodings
  * across driver testdata generations: TIMESTAMP(NANOS) readable only as
  * a raw INT64 of nanoseconds (GenScale still emits this flavor), and
  * plain TIMESTAMP_MICROS (the current driver tier, which Spark reads as
  * TIMESTAMP_NTZ). Round 10 lost every events-reading operator to a
  * hard-coded nanos assumption — this spec pins that BOTH encodings
  * decode to the same TimestampType rows through BOTH ingestion paths
  * (batch `Tables.load`, streaming `EventStream.readStream`).
  */
class EventsEncodingSpec extends SparkTestBase {

  /** One tiny events fixture per encoding, same logical rows: raw INT64
    * nanoseconds (GenScale flavor), TIMESTAMP_NTZ µs (the driver tier's
    * current flavor — isAdjustedToUTC=false), and UTC-adjusted TIMESTAMP
    * µs (the third encoding in the wild; passes through untouched). */
  private lazy val (nanosDir, ntzDir, tzDir, wantUs) = {
    import spark.implicits._
    val rows = Seq(
      (1L, 1704067200000000L, 10L, "click", 1.5, "{}"),
      (2L, 1704067205500000L, 11L, "view", 2.5, "{}"),
      (3L, 1704070800000000L, 10L, "purchase", 9.9, "{}"))
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    def write(ts: org.apache.spark.sql.Column, tag: String): String = {
      val d = Files.createTempDirectory(s"graft_ev_$tag")
      // the driver's layout is a single FILE named events.parquet (the
      // streaming glob depends on it) — write to staging, move the part
      val stage = s"$d/_stage"
      base.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$d/events.parquet"))
      d.toString
    }
    (write(col("ts_us") * 1000L, "nanos"),
      write(timestamp_micros(col("ts_us")).cast(TimestampNTZType), "ntz"),
      write(timestamp_micros(col("ts_us")), "tz"),
      rows.map(r => r._1 -> r._2).toMap)
  }

  private def batchRows(dir: String): Map[Long, Long] =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("Tables.load decodes nanos-as-INT64 events to TimestampType") {
    val df = Tables.load(spark, nanosDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(batchRows(nanosDir) == wantUs)
  }

  test("Tables.load decodes TIMESTAMP_NTZ (driver flavor) to TimestampType") {
    val df = Tables.load(spark, ntzDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(batchRows(ntzDir) == wantUs)
  }

  test("Tables.load passes UTC-adjusted TIMESTAMP events through") {
    val df = Tables.load(spark, tzDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(batchRows(tzDir) == wantUs)
  }

  test("all encodings stream identically through EventStream.readStream") {
    def streamed(dir: String, name: String): Map[Long, Long] = {
      val src = EventStream.readStream(spark, dir)
      assert(src.schema("ts").dataType == TimestampType)
      val q = src.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(streamed(nanosDir, "ev_enc_nanos") == wantUs)
    assert(streamed(ntzDir, "ev_enc_ntz") == wantUs)
    assert(streamed(tzDir, "ev_enc_tz") == wantUs)
  }
}

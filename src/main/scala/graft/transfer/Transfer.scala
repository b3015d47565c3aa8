package graft.transfer

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store transfer utilities (SURVEY §2.1 S12-S14).
  *
  * The reference uploads per-file over WebHDFS with curl, validates by
  * LISTSTATUS size compare, and works around a 95 GB single-file limit with
  * `split --bytes=95G` + remote MERGE (`/root/reference/Migration/
  * copy_data_to_hdlfs.sh:16,52-159`). Here: chunked copy + merge in plain
  * JVM I/O (the transfer plane is not a Spark job — it moves opaque bytes),
  * while the VALIDATION plane is Spark: a join over (name, size) listings,
  * which is exactly the reconciliation shape that scales to millions of
  * files.
  */
object Transfer {

  /** Copy `src` to `dstDir`, splitting into ≤ chunkBytes parts when needed
    * (the 95 GB workaround). Returns the part files written. */
  def copyChunked(src: Path, dstDir: Path, chunkBytes: Long): Seq[Path] = {
    Files.createDirectories(dstDir)
    val size = Files.size(src)
    if (size <= chunkBytes) {
      val dst = dstDir.resolve(src.getFileName.toString)
      Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Seq(dst)
    } else {
      val in = new FileInputStream(src.toFile)
      try {
        val buf = new Array[Byte](1 << 20)
        var part = 0
        var written = Seq.newBuilder[Path]
        var remaining = size
        while (remaining > 0) {
          val dst = dstDir.resolve(s"${src.getFileName}.part$part")
          val out = new FileOutputStream(dst.toFile)
          try {
            var partBytes = 0L
            var n = 0
            while (partBytes < chunkBytes && {
              val want = math.min(buf.length.toLong, chunkBytes - partBytes).toInt
              n = in.read(buf, 0, want); n > 0
            }) {
              out.write(buf, 0, n); partBytes += n
            }
            remaining -= partBytes
          } finally out.close()
          written += dst
          part += 1
        }
        written.result()
      } finally in.close()
    }
  }

  /** Server-side MERGE analog: concatenate parts (in order) into one file
    * and delete them (the DELETE_BATCH step). */
  def merge(parts: Seq[Path], dst: Path): Unit = {
    val out = new FileOutputStream(dst.toFile)
    try parts.foreach { p =>
      val in = new FileInputStream(p.toFile)
      try in.transferTo(out) finally in.close()
    } finally out.close()
    parts.foreach(p => Files.delete(p))
  }

  /** Listing of (file_name, size_bytes) as a DataFrame — the LISTSTATUS
    * validation source (load_schema_and_data.py:342-406). */
  def listing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(f => (f.getName, f.length)).toSeq.sortBy(_._1)
    files.toDF("file_name", "size_bytes")
  }

  /** Upload validation: every local file present remotely with equal size.
    * Returns (n_local, n_matched, ok) — mismatch shape is a full-outer
    * anti-join, exactly J8. */
  def validate(local: DataFrame, remote: DataFrame): (Long, Long, Boolean) = {
    val joined = local.as("l").join(remote.as("r"),
      col("l.file_name") === col("r.file_name") &&
        col("l.size_bytes") === col("r.size_bytes"), "left_semi")
    val nLocal = local.count()
    val nMatched = joined.count()
    (nLocal, nMatched, nLocal == nMatched)
  }
}

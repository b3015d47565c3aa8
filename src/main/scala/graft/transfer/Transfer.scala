package graft.transfer

import java.nio.file.{Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store transfer utilities (SURVEY §2.1 S12-S14).
  *
  * The reference uploads per-file over WebHDFS with curl, validates by
  * LISTSTATUS size compare, and works around a 95 GB single-file limit with
  * `split --bytes=95G` + remote MERGE (`/root/reference/Migration/
  * copy_data_to_hdlfs.sh:16,52-159`).
  *
  * The transfer plane here is the Hadoop `FileSystem` API, so ONE code path
  * serves every scheme a URI names: `file://` in the sandbox specs,
  * `hdfs://` on a cluster, and `webhdfs://host:port/...` — Hadoop's WebHDFS
  * client speaks the same REST endpoints the reference curls (OP=CREATE,
  * LISTSTATUS…), with kerberos/token auth handled by the filesystem.
  * The VALIDATION plane is Spark: a join over (name, size) listings —
  * the reconciliation shape that scales to millions of files.
  */
object Transfer {

  /** Raw-byte-plane filesystem for `uri`: a PRIVATE instance (never the
    * process-wide cache `uri.getFileSystem` shares by scheme/authority/UGI)
    * so disabling checksum siblings here cannot silently turn checksums off
    * for every other user of the cached FS — including Spark's own I/O.
    * Callers own the instance and must close it. */
  private def fsFor(uri: Path, conf: Configuration): FileSystem = {
    val fs = FileSystem.newInstance(uri.toUri, conf)
    // raw byte plane: no sibling .crc artifacts in the upload dirs
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    fs
  }

  private def withFs[A](uri: Path, conf: Configuration)(f: FileSystem => A): A = {
    val fs = fsFor(uri, conf)
    try f(fs) finally fs.close()
  }

  /** Copy `src` to `dstDir`, splitting into ≤ chunkBytes parts when needed
    * (the 95 GB workaround). Works on any FileSystem scheme. Returns the
    * part files written. */
  def copyChunked(src: Path, dstDir: Path, chunkBytes: Long,
      conf: Configuration): Seq[Path] =
    withFs(src, conf) { sfs => withFs(dstDir, conf) { dfs =>
      dfs.mkdirs(dstDir)
      val size = sfs.getFileStatus(src).getLen
      val in = sfs.open(src)
      try {
        if (size <= chunkBytes) {
          val dst = new Path(dstDir, src.getName)
          val out = dfs.create(dst, true)
          try in.transferTo(out) finally out.close()
          Seq(dst)
        } else {
          val buf = new Array[Byte](1 << 20)
          var part = 0
          val written = Seq.newBuilder[Path]
          var remaining = size
          while (remaining > 0) {
            val dst = new Path(dstDir, s"${src.getName}.part$part")
            val out = dfs.create(dst, true)
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
        }
      } finally in.close()
    }}

  /** Server-side MERGE analog: concatenate parts (in order) into one file
    * and delete them (the DELETE_BATCH step). Cross-scheme: parts may live
    * on one filesystem and `dst` on another (one private instance per
    * distinct scheme+authority, closed on exit). */
  def merge(parts: Seq[Path], dst: Path, conf: Configuration): Unit = {
    val cache = scala.collection.mutable.LinkedHashMap.empty[String, FileSystem]
    def fsOf(p: Path): FileSystem = {
      val u = p.toUri
      val key = s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}"
      cache.getOrElseUpdate(key, fsFor(p, conf))
    }
    try {
      val out = fsOf(dst).create(dst, true)
      try parts.foreach { p =>
        val in = fsOf(p).open(p)
        try in.transferTo(out) finally in.close()
      } finally out.close()
      parts.foreach(p => fsOf(p).delete(p, false))
    } finally cache.values.foreach(_.close())
  }

  // NIO-path overloads (sandbox/local callers), same engine underneath.
  def copyChunked(src: JPath, dstDir: JPath, chunkBytes: Long): Seq[JPath] =
    copyChunked(new Path(src.toUri), new Path(dstDir.toUri), chunkBytes,
      new Configuration())
      .map(p => java.nio.file.Paths.get(p.toUri))

  def merge(parts: Seq[JPath], dst: JPath): Unit =
    merge(parts.map(p => new Path(p.toUri)), new Path(dst.toUri),
      new Configuration())

  /** Listing of (file_name, size_bytes) as a DataFrame — for a webhdfs://
    * URI this IS the reference's LISTSTATUS call
    * (load_schema_and_data.py:342-406), issued by the Hadoop client. */
  def listing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .map(s => (s.getPath.getName, s.getLen)).sortBy(_._1)
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

package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Control-file IO through each path's own Hadoop FileSystem.
  *
  * The migration phases exchange state via small text files (iq_tables.list,
  * batch lists, ExtractedTables.out, HDL_LoadedTables.out — the reference's
  * control files). The extract manifests already ride the Hadoop FS so an
  * out dir on hdfs:// or an object store works; this routes the control
  * files through the same layer, so the whole phase protocol — including
  * the stale-batch cleanup guarding the batches+spill==iq_tables
  * invariant — works wherever the manifests do, instead of half-working
  * through java.nio on local paths only.
  */
object Ctl {

  private def fsOf(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  def write(conf: Configuration, path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fsOf(p, conf).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readLines(conf: Configuration, path: String): Seq[String] = {
    val p = new Path(path)
    val in = fsOf(p, conf).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    fsOf(p, conf).exists(p)
  }

  def delete(conf: Configuration, path: String): Unit = {
    val p = new Path(path)
    fsOf(p, conf).delete(p, false)
  }

  def mkdirs(conf: Configuration, path: String): Unit = {
    val p = new Path(path)
    fsOf(p, conf).mkdirs(p)
  }

  /** Names of the plain files directly under `dir` (empty if absent). */
  def listFileNames(conf: Configuration, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(p, conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq
  }
}

package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Landing-zone file orchestration — the reference's quarantine / archive
  * / cleanup side-effects (move_files.py:26-62, main.py:127-139, 293-312,
  * local_file_delete.py, aws_read.py:7-22) over the Hadoop FileSystem
  * API, so every path is scheme-agnostic: `/local/dir`, `file:///...`,
  * `hdfs://...`, or `s3a://bucket/prefix` all resolve through the same
  * code path. On an object store the "move" is the storage connector's
  * copy+delete rename; the semantics queries observe are identical:
  * rejected files leave the landing zone, processed files move to an
  * archive, the zone ends each run empty.
  *
  * The Configuration is deliberately plain: credentials/endpoints come
  * from the standard Hadoop config chain (core-site.xml, env), never from
  * code.
  */
object LandingZone {

  /** Default Hadoop configuration: the active Spark session's (so
    * spark.hadoop.* settings — s3a credentials, endpoints — govern these
    * file operations exactly as they govern spark.read), falling back to
    * the standard config chain when no session is running. */
  private[graft] def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fs(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  private def moveInto(file: String, destDir: String, conf: Configuration): String = {
    val src = new Path(file)
    val dir = new Path(destDir)
    val srcFs = fs(src, conf)
    val dstFs = fs(dir, conf)
    dstFs.mkdirs(dir)
    val dest = new Path(dir, src.getName)
    if (srcFs.getUri == dstFs.getUri) {
      if (dstFs.exists(dest) && !dstFs.delete(dest, false))
        throw new java.io.IOException(s"cannot replace $dest")
      if (!srcFs.rename(src, dest))
        throw new java.io.IOException(s"rename $src -> $dest failed")
    } else {
      // cross-filesystem move (e.g. s3a -> local quarantine): copy+delete,
      // the same thing an object-store rename is underneath
      org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dest,
        /*deleteSource=*/ true, /*overwrite=*/ true, conf)
    }
    dest.toString
  }

  /** Move rejected files to the error directory (main.py:127-133). */
  def quarantine(files: Seq[String], errorDir: String,
                 conf: Configuration = sessionHadoopConf()): Seq[String] =
    files.map(moveInto(_, errorDir, conf))

  /** Move processed files to the archive prefix (main.py:293-295,
    * upload_to_s3.py:10-24 semantics for object-store archive targets). */
  def archive(files: Seq[String], archiveDir: String,
              conf: Configuration = sessionHadoopConf()): Seq[String] =
    files.map(moveInto(_, archiveDir, conf))

  /** Delete everything inside a directory, keeping the directory
    * (local_file_delete.py:5-19). */
  def clean(dir: String, conf: Configuration = sessionHadoopConf()): Unit = {
    val p = new Path(dir)
    val f = fs(p, conf)
    if (f.exists(p))
      f.listStatus(p).foreach(st => f.delete(st.getPath, true))
  }

  /** List csv files under a landing prefix (main.py:33, 88-92 triage
    * input; aws_read.py:7-22 object-listing semantics). */
  def listCsv(dir: String, conf: Configuration = sessionHadoopConf()): Seq[String] = {
    val p = new Path(dir)
    val f = fs(p, conf)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".csv"))
      .map(_.getPath.toString)
  }
}

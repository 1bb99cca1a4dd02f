package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Landing-zone file orchestration — the reference's quarantine / archive
  * / cleanup side-effects (move_files.py:26-62, main.py:127-139, 293-312,
  * local_file_delete.py) as pure local/posix-path utilities. On a real
  * deployment these paths are object-store URIs handled by the storage
  * layer (rename under s3a committers); the semantics kept here are the
  * ones queries observe: rejected files leave the landing zone, processed
  * files move to an archive, the zone ends each run empty.
  */
object LandingZone {

  private def moveInto(file: String, destDir: String): String = {
    val src = Paths.get(file)
    Files.createDirectories(Paths.get(destDir))
    val dest = Paths.get(destDir).resolve(src.getFileName)
    Files.move(src, dest, StandardCopyOption.REPLACE_EXISTING)
    dest.toString
  }

  /** Move rejected files to the error directory (main.py:127-133). */
  def quarantine(files: Seq[String], errorDir: String): Seq[String] =
    files.map(moveInto(_, errorDir))

  /** Move processed files to the archive prefix (main.py:293-295). */
  def archive(files: Seq[String], archiveDir: String): Seq[String] =
    files.map(moveInto(_, archiveDir))

  /** Delete everything inside a directory, keeping the directory
    * (local_file_delete.py:5-19). */
  def clean(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.list(p)
      try s.forEach { f: Path =>
        if (Files.isDirectory(f)) org.apache.commons.io.FileUtils.deleteDirectory(f.toFile)
        else Files.delete(f)
      } finally s.close()
    }
  }

  /** List csv files in a landing dir (main.py:33, 88-92 triage input). */
  def listCsv(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(f => f.toString.endsWith(".csv")).map(_.toString).toSeq
      } finally s.close()
    }
  }
}

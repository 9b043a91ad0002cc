package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem helpers for the manifest/staging protocol. On a real
  * cluster these calls are Hadoop FileSystem rename/delete (or Iceberg
  * metadata commits); the sandbox runs on file://. */
object Fs {

  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

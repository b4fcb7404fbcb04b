package graft.tools

import java.nio.file.{Files, Path}

/** Filesystem helpers for scratch-directory lifecycle (streaming
  * checkpoints, materialized-table scratch, compaction staging).
  */
object FsUtils {

  /** Exception-safe recursive delete. `Files.walk` returns a Stream holding
    * an open directory handle; it must be closed even when a delete throws,
    * or repeated invocations (DeterminismSpec re-runs queries) leak handles.
    */
  def deleteRecursively(root: Path): Unit = {
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        // materialize deepest-first before deleting — can't delete while
        // the walk is still traversing
        s.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => Files.deleteIfExists(p))
      } finally s.close()
    }
  }
}

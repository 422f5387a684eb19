package graft.core

/** The one recursive-delete implementation (streaming stage dirs, doc-table
  * compaction) — file-tree mutation logic should not be duplicated. */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Recursive file-tree copy (q183's compacted-read clones the memoized
    * drained-rollup artifact before mutating it — a raw copy, never a
    * Spark rewrite, so the clone is byte-identical to the pristine dir). */
  def copyRecursively(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten
        .foreach(f => copyRecursively(f, new java.io.File(dst, f.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}

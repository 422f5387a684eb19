package graft.core

/** The one recursive-delete implementation (streaming stage dirs, doc-table
  * compaction) — file-tree mutation logic should not be duplicated. */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }
}

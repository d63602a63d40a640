package graft.util

import java.io.File

/** Tiny local-filesystem helpers for the driver-side staging dirs the
  * operator-exercise queries use (parquet roundtrip scratch, IVF index
  * staging). Local paths only — cluster-scale artifacts go through real
  * storage, not java.io.File.
  */
object Fs {

  /** Recursively delete a file or directory; missing paths are a no-op. */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }

  def deleteRecursively(path: String): Unit = deleteRecursively(new File(path))
}

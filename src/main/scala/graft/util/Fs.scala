package graft.util

import java.nio.file.{Files, Path, Paths}

/** Tiny filesystem helpers shared by the temp-index lifecycles (t52's
  * driver entry, ExplainCheck's DPP probe, the DAG-resume spec). */
object Fs {

  /** Recursive delete, a no-op when `dir` does not exist. The
    * `Files.walk` stream holds open DirectoryStreams and MUST be
    * closed — leaking it accumulates directory handles on every
    * bench rep / verify pass (the reason this lives in one place
    * instead of three copy-pasted blocks). */
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }
}

package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Cross-process-atomic publication of a generated fixture directory.
  *
  * The corpus `ensure()`s were JVM-`synchronized` but not cross-process
  * atomic: two driver processes (entry smoke + bench, or Verify + a
  * probe) could interleave so one Spark job LISTS the deterministic
  * temp dir while the other is still writing files into it — observed
  * as a spurious mid-run AnalysisException in the r20 driver tail
  * (recovered by a retry, but it pollutes artifacts and burns retry
  * budget). The fix is the classic stage-then-rename: build into a
  * fresh sibling staging dir, publish with one rename(2) (ATOMIC_MOVE
  * on the same filesystem), so the deterministic path either does not
  * exist or is complete — no reader can observe a torn listing.
  */
private[graft] object AtomicDir {

  /** Return `target` if `complete(target)` already holds; otherwise
    * build via `write(stage)` into a unique staging sibling and
    * atomically rename it to `target`.
    *
    * Races resolve safely: if another post-fix process publishes first,
    * the rename fails, the winner's dir is complete, and the stage is
    * discarded. If the rename fails and `target` is STILL incomplete
    * (a torn leftover from a pre-fix writer, which a rename cannot
    * replace), the staged dir itself is returned — same deterministic
    * content, different path — so the caller never reads a torn dir.
    */
  def publish(target: Path)(complete: Path => Boolean)
      (write: Path => Unit): String = {
    if (complete(target)) return target.toString
    val stage = Files.createTempDirectory(
      target.getParent, target.getFileName.toString + ".stage")
    write(stage)
    try {
      Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
      target.toString
    } catch {
      case _: java.nio.file.FileSystemException =>
        if (complete(target)) { deleteRecursively(stage); target.toString }
        else stage.toString
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }
}

package graft

/** JVM-exit cleanup for operator-scoped temp trees.
  *
  * Several operators stage fixture files or maintain storage-resident
  * indexes under `Files.createTempDirectory` roots (streaming drops,
  * txn-log tables, restore destinations). Those trees must outlive
  * the operator call — the returned DataFrame lazily reads from them
  * — so they can't be deleted inline; registering them here removes
  * the whole tree at JVM exit instead of leaking it into /tmp across
  * bench/verify runs.
  */
object TmpDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register `root` for recursive deletion at JVM exit; returns it. */
  def cleanupOnExit(root: java.nio.file.Path): java.nio.file.Path = {
    registered.add(root)
    if (hookArmed.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var p = registered.poll()
        while (p != null) { deleteTree(p); p = registered.poll() }
      }, "graft-tmpdir-cleanup"))
    }
    root
  }

  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () } // best-effort at exit
}

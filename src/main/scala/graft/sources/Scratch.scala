package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch parquet roots for the queries that materialize an index or
  * sink layout (IVF/PQ indexes, bucketed tables, compaction targets,
  * streaming checkpoints). The returned DataFrames read these paths
  * LAZILY, so the trees must outlive the query function — they are
  * reclaimed in one pass at JVM exit instead, so repeated driver runs
  * do not accumulate disk (r6 ADVICE #2).
  */
object Scratch {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    roots.forEach { p =>
      try {
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
      } catch { case _: Exception => () }
    }
  }, "graft-scratch-cleaner"))

  /** A fresh temp directory, registered for recursive deletion at exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p.toString
  }
}

package graft.util

import java.nio.file.{Files, Path}

/** Scratch-directory discipline for the harness paths that must stage files
  * (streaming replay, materialized-index fixtures, bench warehouse): every
  * scratch dir is registered for recursive deletion at JVM exit, and callers
  * that finish with a dir earlier delete it eagerly via [[delete]]. Keeps
  * repeated bench/verify rounds from accreting staged parquet in /tmp.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    registered.forEach(p => delete(p))
  }

  /** Create a temp dir that is recursively deleted at JVM exit (or earlier,
    * if the caller invokes [[delete]] once the staged data is consumed).
    */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Recursively delete a directory tree; missing paths are a no-op.
    * Best-effort by contract: callers invoke this on the hot path after a
    * query's results are already computed (e.g. sessionizeReplay), so a
    * concurrent removal mid-walk (UncheckedIOException from the stream)
    * must degrade to "cleanup skipped", never fail the query.
    */
  def delete(root: Path): Unit = {
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    try {
      val stream = Files.walk(root)
      try
        stream.iterator().asScala.toSeq.reverse.foreach { p =>
          try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () }
        }
      finally stream.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }
  }
}

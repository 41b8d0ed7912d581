package graft.ops

import java.nio.file.{Files, Path}

/** Session-scratch directories (shredded layouts, z-order evidence,
  * streaming bench IO): created under the system temp dir and removed on
  * JVM exit, so repeated sessions don't accumulate parquet under /tmp
  * (an advisory finding against the ad-hoc per-site temp dirs).
  */
object Scratch {
  def dir(prefix: String): Path = {
    val tmp = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      // the walk itself can fail (dir already removed by another hook or an
      // external cleaner) — never let this hook die with a stack trace
      try {
        val paths = Files.walk(tmp).iterator().asScala.toSeq
        paths.sortBy(-_.getNameCount).foreach(p =>
          try Files.deleteIfExists(p) catch { case _: Exception => () })
        // files landing after the walk snapshot leave the dir non-empty;
        // one more attempt on the (now likely empty) root
        Files.deleteIfExists(tmp)
      } catch { case _: Exception => () }
    }
    tmp
  }
}

package graft

import java.nio.file.{Files, Path}

/** Self-cleaning temp directories for the streaming queries (source
  * symlink dirs, checkpoint dirs, sink output dirs). Every dir created
  * here is recursively deleted by ONE JVM shutdown hook, so repeated
  * Verify/Bench/test invocations in long-lived sessions don't
  * accumulate /tmp litter — the same lifecycle discipline CacheScope
  * applies to cached plans. (Deletion at exit, not at query end: a
  * returned DataFrame may lazily re-read its checkpoint/sink until the
  * caller materializes it, so the paths must outlive the query
  * builder.)
  */
object TempPaths {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try {
          if (Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            Files.walk(p).iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists(_))
          }
        } catch { case _: Throwable => () }
      }
    }, "graft-temp-cleanup"))
  }

  /** Create a temp directory that is removed (recursively) at JVM
    * exit. The prefix is also suffixed per-process by
    * createTempDirectory itself, so concurrent harnesses never share a
    * path.
    */
  def dir(prefix: String): Path = {
    hook
    val d = Files.createTempDirectory(prefix)
    created.add(d)
    d
  }
}

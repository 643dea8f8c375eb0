package graft

/** JVM-exit cleanup registry for temp directories that operators
  * materialize (stream sinks/checkpoints, source-format round-trips):
  * repeated verify/bench/test runs on one host would otherwise
  * accumulate one copy per process forever. One registry + one
  * shutdown hook, shared by every call site. */
object TempDirs {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val hook: Unit =
    sys.addShutdownHook {
      dirs.forEach { base =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(base))
      }
    }: Unit

  /** Create a fresh temp directory registered for JVM-exit removal. */
  def create(prefix: String): String = {
    hook
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.add(d): Unit
    d
  }
}

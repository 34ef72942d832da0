package graft

import java.nio.file.{Files, Path}

/** Test temp-dir hygiene: specs that synthesize parquet fixtures
  * (StatEdgeSpec's per-iteration SF dirs, PlanGateSpec's probe table)
  * delete them in afterAll instead of leaking a dir per ScalaCheck
  * iteration (round-11 ADVICE). */
object TempDirs {
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally walk.close() // an unclosed walk leaks a directory stream per call
    }
  }
}

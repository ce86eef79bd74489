package graft

import org.scalatest.funsuite.AnyFunSuite

/** PARITY.md is the generated-once, maintained-forever inventory of
  * batch↔stream twins. This spec makes it impossible to add a new
  * `transformWithState` twin without listing it: every def in
  * src/main/scala/graft/ whose body calls `.transformWithState(` must
  * appear (by name, in backticks or plain) in PARITY.md. Source-scan
  * rather than reflection because the twins are plain functions, not
  * a registry — the scan IS the registry. */
class ParitySpec extends AnyFunSuite {

  private def scalaSources(root: java.io.File): Seq[java.io.File] =
    root.listFiles.toSeq.flatMap { f =>
      if (f.isDirectory) scalaSources(f)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Nil
    }

  /** Names of defs whose body (up to the next def/class/object at equal
    * or shallower indent — a heuristic that works for this codebase's
    * uniform 2-space style) contains a transformWithState call. */
  private def twsDefs(file: java.io.File): Seq[String] = {
    val lines = java.nio.file.Files.readAllLines(file.toPath)
    (0 until lines.size).filter(i =>
      lines.get(i).contains(".transformWithState(")).map { i =>
      (i to 0 by -1).collectFirst {
        case j if lines.get(j).trim.startsWith("def ") =>
          lines.get(j).trim.stripPrefix("def ")
            .takeWhile(c => c.isLetterOrDigit || c == '_')
      }.getOrElse(fail(
        s"no enclosing def for transformWithState at ${file.getName}:$i"))
    }.distinct
  }

  test("every transformWithState stream twin is inventoried in " +
      "PARITY.md") {
    val parity = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PARITY.md")), "UTF-8")
    val srcRoot = new java.io.File("src/main/scala/graft")
    assert(srcRoot.isDirectory, s"run from the repo root: $srcRoot")
    val twins = scalaSources(srcRoot).flatMap(twsDefs).distinct
    // the scan must actually find the known twins — an empty scan
    // would make the listing check vacuous (7 transformWithState
    // twins exist as of round 17)
    assert(twins.size >= 7, s"scan found only $twins")
    val missing = twins.filterNot(parity.contains)
    assert(missing.isEmpty,
      s"stream twins missing from PARITY.md: $missing — add a row " +
        "(operator, mechanism, artifact, proving spec) for each")
  }

  test("PARITY.md's batch-operator column names only real registry " +
      "entries") {
    val parity = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PARITY.md")), "UTF-8")
    val referenced = "q\\d+[a-z0-9_]*".r.findAllIn(parity).toSeq.distinct
    val known = graft.SparkEntry.queries.keySet
    val unknown = referenced.filterNot(q =>
      known.exists(k => k == q || k.startsWith(q + "_") || k.startsWith(q)))
    assert(unknown.isEmpty,
      s"PARITY.md references unknown registry entries: $unknown")
  }
}

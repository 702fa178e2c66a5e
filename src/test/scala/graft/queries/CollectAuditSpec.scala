package graft.queries

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale guard over ALL of `src/main/scala/graft`: a
  * `.collect()` pulls a frame onto the one driver JVM, which is only
  * legitimate when that frame is O(state) — an aggregated summary
  * row, a model's cells, a calendar-sized series, a documented
  * sample pool — never a corpus-derived set (the q472 failure mode:
  * the full purchase edge list, fine at sf0.01, a driver OOM at
  * 100×). Plan-shape guards can't see this (the collect happens
  * during query CONSTRUCTION, before any plan exists), so the rule
  * is enforced at the source level: every `.collect()` occurrence
  * must carry a `bounded-collect:` annotation within the preceding
  * lines stating WHY the collected frame is state-sized. An
  * unannotated collect fails the suite; an annotation on an
  * unbounded frame is visible to review exactly where it lies.
  * (Originally scoped to `queries/`; widened to the whole library in
  * round 6 — the next regression is likelier in an operator than in
  * a gate.)
  */
class CollectAuditSpec extends AnyFunSuite {

  private val queriesDir = Paths.get("src/main/scala/graft")
  private val marker = "bounded-collect:"
  private val lookback = 6

  private def scalaFiles(dir: Path): Seq[Path] =
    scala.util.Using.resource(Files.walk(dir)) { walk =>
      walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    }

  /** Strip a trailing `//` line comment so a `.collect()` mentioned
    * in PROSE (a Scaladoc note, an inline rationale) doesn't force a
    * bounded-collect annotation — the audit is about code that runs.
    * Good enough for this codebase: no string literal under
    * `queries/` carries `//` ahead of a real collect call.
    */
  private def codePart(line: String): String = {
    val i = line.indexOf("//")
    if (i < 0) line else line.substring(0, i)
  }

  test("every .collect() in a gate query is annotated bounded-collect") {
    assert(Files.isDirectory(queriesDir), s"missing $queriesDir")
    val violations = scalaFiles(queriesDir).flatMap { p =>
      val lines = Files.readAllLines(p).asScala.toIndexedSeq
      lines.zipWithIndex.collect {
        case (line, i)
            if codePart(line).contains(".collect()") &&
              !(math.max(0, i - lookback) to i)
                .exists(j => lines(j).contains(marker)) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(violations.isEmpty,
      "unannotated .collect() in gate queries (add a `// bounded-collect: " +
        "<why O(state)>` line above, or keep the frame in Spark):\n" +
        violations.mkString("\n"))
  }

  test("annotated collects are preceded by an aggregation, limit, or sample cap") {
    // second line of defense: the annotation must sit on a frame the
    // source visibly bounds — a grouped/global agg, a limit, or a
    // SamplePools-capped filter — within a short window above it
    val bounded = Seq(".agg(", ".limit(", "SamplePools.", "distinct()",
      "weekly(")
    // an annotation stating an explicit O(…) bound also counts — for
    // collects whose bounding operator sits above the 12-line window
    def boundedLine(l: String): Boolean =
      bounded.exists(l.contains) || (l.contains(marker) && l.contains("O("))
    val suspicious = scalaFiles(queriesDir).flatMap { p =>
      val lines = Files.readAllLines(p).asScala.toIndexedSeq
      lines.zipWithIndex.collect {
        case (line, i) if codePart(line).contains(".collect()") =>
          val window = (math.max(0, i - 12) to i).map(lines)
          (s"$p:${i + 1}", window)
      }.collect {
        case (loc, window) if !window.exists(boundedLine) => loc
      }
    }
    assert(suspicious.isEmpty,
      "collect() with no visible bound (agg/limit/SamplePools cap) nearby:\n" +
        suspicious.mkString("\n"))
  }
}

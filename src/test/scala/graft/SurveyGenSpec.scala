package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins SURVEY_QUERIES.md (the generated §7.3 table) to the runtime
  * registry: every declared query is classified, appears in the
  * checked-in table exactly once, and the counts line matches. The
  * round column is NOT byte-asserted (the next driver artifact
  * legitimately refines `r{N}*` rows) — name-set sync is the drift
  * that matters. */
class SurveyGenSpec extends AnyFunSuite {
  private val root = Paths.get(".")

  test("every declared query has a family (classifier is total)") {
    Queries.all.foreach { case (n, _, _) =>
      assert(SurveyGen.family(n).nonEmpty)
    }
  }

  test("checked-in SURVEY_QUERIES.md names = registry names, 1:1") {
    val f = root.resolve("SURVEY_QUERIES.md")
    assert(Files.exists(f), "run `graft.SurveyGen` to generate")
    val text = Files.readAllLines(f).asScala.mkString("\n")
    // query names are the only pure-[a-z0-9_] backticked tokens in
    // the generated file (everything else carries a dot, star, or
    // uppercase), so no registry-filter: a stale doc-only name fails
    val inDoc = "`([a-z0-9_]+)`".r.findAllMatchIn(text)
      .map(_.group(1)).toSeq
    val reg = Queries.all.map(_._1)
    assert(inDoc.sorted == reg.sorted,
      s"doc/registry drift: doc-only=${inDoc.diff(reg)} " +
        s"registry-only=${reg.diff(inDoc)} — regenerate with SurveyGen")
    assert(text.contains(s"**${reg.size} queries"),
      "counts line stale — regenerate with SurveyGen")
  }

  test("prose counts in README.md and SURVEY.md match the registry") {
    val n = Queries.all.size
    val readme = Files.readAllLines(root.resolve("README.md"))
      .asScala.mkString("\n")
    assert(readme.contains(s"$n declared queries"),
      s"README.md query count drifted — update to '$n declared queries'")
    val survey = Files.readAllLines(root.resolve("SURVEY.md"))
      .asScala.mkString("\n")
    assert(survey.contains(s"$n queries as of round"),
      s"SURVEY.md query count drifted — update to '$n queries as of round N'")
  }

  test("oracle coverage stated in the doc matches the registry") {
    val withOracle = Queries.all.count(_._3.isDefined)
    val text = Files.readAllLines(root.resolve("SURVEY_QUERIES.md"))
      .asScala.mkString("\n")
    assert(text.contains(s"$withOracle oracle-checked"))
  }
}

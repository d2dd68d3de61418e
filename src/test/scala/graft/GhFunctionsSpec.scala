package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GhFunctions._

/** Truth tables for the two distinct bot predicates (SURVEY §2.3, §7.4.3):
  * F1 (ingest, case-sensitive) ≠ F2 (batch heuristic, lowercased). */
class GhFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val corpus = Seq(
    // login, keptByF1, isBotByF2
    ("octocat", true, false),
    ("dependabot[bot]", false, true),
    ("foo-bot", false, true),
    ("robot", true, true),          // ends "bot" but not "-bot": F2-only
    ("awsuser", true, true),        // ^aws
    ("my-ci", true, true),          // -ci
    ("ci-runner", true, true),      // ci-
    ("releasebot", true, true),     // release + bot$
    ("botanist-dev", true, false),  // near-boundary non-bot in both
    ("Robot", true, true),          // F1 case-sensitive keeps; F2 lowercases
    ("stargazer", true, false),
    ("security-team", true, true),  // contains "security"
    ("builder99", true, true),      // contains "build"
    // F1 keeps null logins (reference inserts them); F2 calls them bots
    (null.asInstanceOf[String], true, true))

  test("F1 ingest filter truth table") {
    val got = corpus.toDF("login", "f1", "f2")
      .select($"login", keepIngest($"login").as("kept"))
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    corpus.foreach { case (login, f1, _) =>
      assert(got(Option(login)) === f1, s"F1($login)")
    }
  }

  test("F2 batch bot heuristic truth table") {
    val got = corpus.toDF("login", "f1", "f2")
      .select($"login", isBotBatch($"login").as("bot"))
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    corpus.foreach { case (login, _, f2) =>
      assert(got(Option(login)) === f2, s"F2($login)")
    }
  }

  test("F2 folded regex ≡ 15-predicate decomposition") {
    // adversarial corpus: every pattern boundary + random-ish strings
    val logins = corpus.map(_._1) ++ Seq(
      "bot", "abot", "a-bot", "a[bot]b", "AWS", "aws", "xaws", "ci-",
      "-ci", "xci-y", "x-ciy", "deployer", "undeployed", "rebuild",
      "released", "snyk-scan", "o", "")
    val df = logins.toDF("login")
      .select($"login", isBotBatch($"login").as("a"),
              isBotBatchUnfolded($"login").as("b"))
    assert(df.filter($"a" =!= $"b").count() === 0)
  }

  test("hour/day key formats match the reference (unpadded hour)") {
    val df = Seq("2024-03-05 07:04:05", "2024-03-05 23:59:59")
      .toDF("s").select(to_timestamp($"s").as("ts"))
      .select(hourKey($"ts").as("hk"), dayKey($"ts").as("dk"))
      .collect()
    assert(df(0).getString(0) === "2024-03-05:7")   // not "07"
    assert(df(1).getString(0) === "2024-03-05:23")
    assert(df(0).getString(1) === "2024-03-05:sum")
  }
}

package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registration census — closes the q331/q334 failure class (VERDICT r13
  * item 2): a finished `GraftQuery` that never gets appended to its
  * module's `queries` seq is invisible to Verify, Bench, and the plan
  * gate, so nothing red ever points at it. This spec makes the
  * DEFINITION site the source of truth: every `GraftQuery(...)` /
  * `GraftQuery.noOracle(...)` call in the main source tree must
  * correspond to exactly one entry in `SparkEntry.all`, and vice versa.
  *
  * The scan is textual by design — an unregistered query is unreachable
  * through the object graph, so reflection can't see the omission; the
  * source text can.
  */
class RegistrationCensusSpec extends AnyFunSuite {

  private val srcRoot = Paths.get("src/main/scala/graft")

  /** `GraftQuery(` or `GraftQuery.noOracle(` followed by the name
    * literal (same line or a following line — the registry style puts
    * the name first in either position).
    */
  private val defRe =
    """GraftQuery(?:\.noOracle)?\(\s*"([^"]+)"""".r

  private def scalaFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try s.iterator.asScala.filter(_.toString.endsWith(".scala")).toVector
    finally s.close()
  }

  private lazy val definedNames: Seq[String] =
    scalaFiles(srcRoot)
      .filterNot(_.endsWith("Tables.scala")) // the case class + companion
      .flatMap { p =>
        val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        defRe.findAllMatchIn(text).map(_.group(1)).toSeq
      }

  private lazy val registered: Seq[String] = SparkEntry.all.map(_.name)

  test("every GraftQuery definition in main source is registered") {
    val dead = definedNames.toSet -- registered.toSet
    assert(dead.isEmpty,
      s"defined but never registered in a module's `queries` seq " +
        s"(dead code the oracle can't vouch for): ${dead.toSeq.sorted}")
  }

  test("every registered query has a GraftQuery definition the scan sees") {
    // The converse arm guards the SCANNER: if the definition style
    // changes (name no longer the first literal after the call), this
    // side goes red before the dead-code arm silently stops gating.
    val unseen = registered.toSet -- definedNames.toSet
    assert(unseen.isEmpty,
      s"registered but not found by the definition scan - update " +
        s"RegistrationCensusSpec's regex: ${unseen.toSeq.sorted}")
  }

  test("registered names are unique and definitions are one-per-name") {
    val dupReg = registered.groupBy(identity).collect {
      case (n, xs) if xs.size > 1 => n
    }
    assert(dupReg.isEmpty, s"duplicate registrations: ${dupReg.toSeq.sorted}")
    val dupDef = definedNames.groupBy(identity).collect {
      case (n, xs) if xs.size > 1 => n
    }
    assert(dupDef.isEmpty, s"duplicate definitions: ${dupDef.toSeq.sorted}")
  }

  test("every fingerprint-eligible registered query has a golden row") {
    // PlanHygieneSpec fails on a NEW query at test time; this arm makes
    // the omission legible at a glance (name-level diff, no plan build)
    // and keeps gating even if the fingerprint test is being skipped.
    val goldenPath = Paths.get("src/test/resources/plan_fingerprints.tsv")
    assert(Files.exists(goldenPath), s"missing $goldenPath")
    val golden = new String(Files.readAllBytes(goldenPath),
      StandardCharsets.UTF_8).linesIterator
      .filter(_.nonEmpty).map(_.split("\t", 2)(0)).toSet
    val stray = golden -- registered.toSet
    assert(stray.isEmpty,
      s"goldens for unregistered queries (regenerate): ${stray.toSeq.sorted}")
    // The converse — the direction that actually keeps gating if the
    // fingerprint test is skipped (ADVICE r14 item 1): every registered
    // query OUTSIDE the explicit ineligible set (streaming twins have no
    // batch plan to fingerprint) must have a golden row.
    val ineligible =
      graft.streaming.StreamingQueries.queries.map(_.name).toSet
    val missing = registered.toSet -- ineligible -- golden
    assert(missing.isEmpty,
      s"registered fingerprint-eligible queries with no golden row " +
        s"(GRAFT_REGEN_PLANS=1 testOnly graft.operators.PlanHygieneSpec): " +
        s"${missing.toSeq.sorted}")
  }
}

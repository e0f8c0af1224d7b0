package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Structural lint: every `broadcast()` hint in src/main must be
  * consciously classified in BROADCAST_INVENTORY.md by the bound that
  * keeps its build side small at ANY corpus size. An unbounded build
  * side (the x125 doc-cardinality mistake, removed in round 11) is an
  * executor OOM at 100×; this spec makes it impossible to add (or move)
  * a hint without re-classifying it — the per-file site counts here and
  * in the inventory must match exactly.
  */
class BroadcastLintSpec extends AnyFunSuite {

  private val allowedClasses = Set(
    "one-row", "fixed", "query-slice", "vocab", "types", "parallelism",
    "cells", "dim", "dim-table", "eval-slice")

  private def repoRoot: Path = {
    // sbt runs tests with cwd = project root; be robust to a fork cwd
    val cand = Seq(Paths.get("."), Paths.get(".."))
      .map(_.toAbsolutePath.normalize)
    cand.find(p => Files.exists(p.resolve("BROADCAST_INVENTORY.md")))
      .getOrElse(fail("BROADCAST_INVENTORY.md not found from " + cand))
  }

  /** `broadcast(` call sites per file — OCCURRENCES, not lines (two
    * hints on one line count twice), with comment-only lines and
    * trailing `//` comments stripped so a prose mention never counts.
    * String literals could still overcount in principle, but no graft
    * source embeds "broadcast(" in a literal — and an overcount fails
    * loudly here rather than letting a real hint hide. Relative to the
    * repo root.
    */
  private def actualCounts(root: Path): Map[String, Int] = {
    val srcRoot = root.resolve("src/main/scala")
    val walk = Files.walk(srcRoot)
    val files =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala")).toVector
      finally walk.close()
    files.flatMap { p =>
      val n = Files.readAllLines(p).asScala.map { line =>
        val t = line.trim
        if (t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")) 0
        else {
          val code = t.indexOf("//") match {
            case -1 => t
            case i => t.substring(0, i)
          }
          "broadcast\\(".r.findAllIn(code).length
        }
      }.sum
      if (n > 0) Some(root.relativize(p).toString -> n) else None
    }.toMap
  }

  /** (file → declared site count, declared classes) from the inventory's
    * call-site table.
    */
  private def declared(root: Path): (Map[String, Int], Seq[String]) = {
    val lines = Files.readAllLines(
      root.resolve("BROADCAST_INVENTORY.md")).asScala
    val rows = lines.filter(l =>
      l.startsWith("| src/main/scala/")).map { l =>
      val cells = l.split("\\|").map(_.trim).filter(_.nonEmpty)
      (cells(0), cells(1).toInt, cells(3))
    }
    val counts = rows.map(r => r._1 -> r._2).toMap
    // "query-slice ×6, cells ×5" → class tokens without multipliers
    val classes = rows.flatMap(_._3.split(",").map(
      _.trim.split("\\s*×")(0).trim)).toSeq
    (counts, classes)
  }

  test("every broadcast() hint in src/main is inventoried with a bounded class") {
    val root = repoRoot
    val actual = actualCounts(root)
    val (decl, classes) = declared(root)

    val missing = actual.keySet.diff(decl.keySet)
    val stale = decl.keySet.diff(actual.keySet)
    val wrong = actual.keySet.intersect(decl.keySet)
      .filter(f => actual(f) != decl(f))
      .map(f => s"$f: code has ${actual(f)}, inventory says ${decl(f)}")

    assert(missing.isEmpty,
      s"broadcast() sites not in BROADCAST_INVENTORY.md: $missing — " +
        "classify the new hint's bound before shipping it")
    assert(stale.isEmpty,
      s"inventory rows with no broadcast() left in code: $stale")
    assert(wrong.isEmpty, wrong.mkString("; "))

    val badClasses = classes.filterNot(allowedClasses.contains)
    assert(badClasses.isEmpty,
      s"bound classes outside the allowed set: $badClasses")

    // the prose total must agree with the table sum — round 11 shipped
    // "84 hinted sites" over an 85-row table and nothing caught it
    val tableSum = decl.values.sum
    val statedTotal = Files.readAllLines(
      root.resolve("BROADCAST_INVENTORY.md")).asScala
      .collectFirst { case l if l.matches("^\\d+ hinted sites.*") =>
        l.takeWhile(_.isDigit).toInt }
    assert(statedTotal.contains(tableSum),
      s"inventory prose total $statedTotal != call-site table sum $tableSum")
  }
}

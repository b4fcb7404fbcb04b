package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Enforces TWINS.json — the machine-readable rows-only→twin manifest.
  *
  * A query in `SparkEntry.queries` with no `SparkEntry.oracleSql` entry is
  * graded `no_oracle` (rows-only) by the driver; the engineering contract
  * is that every such query names at least one ORACLE-GREEN portable twin
  * that hash-checks the same algorithm against DuckDB, plus the pinning
  * specs tying the default path to the twin's semantics. This spec makes
  * the contract mechanical: adding a rows-only query without a manifest
  * entry, letting an entry go stale, or pointing a twin at a query that is
  * itself not oracle-checkable FAILS the build.
  */
class TwinsManifestSpec extends AnyFunSuite {

  private lazy val manifest: Map[String, (Seq[String], Seq[String])] = {
    val root = new ObjectMapper().readTree(
      new java.io.File("TWINS.json"))
    root.fieldNames().asScala
      .filterNot(_.startsWith("_"))
      .map { k =>
        val v = root.get(k)
        val twins = v.get("twins").elements().asScala.map(_.asText()).toSeq
        val specs = v.get("pinning_specs").elements().asScala
          .map(_.asText()).toSeq
        k -> (twins, specs)
      }.toMap
  }

  private lazy val rowsOnly: Set[String] =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  test("every no_oracle query has a TWINS.json entry") {
    val missing = rowsOnly -- manifest.keySet
    assert(missing.isEmpty,
      s"rows-only queries without a twin manifest entry: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add them to TWINS.json " +
        "with an oracle-green twin and a pinning spec")
  }

  test("no stale manifest entries: every key is a live rows-only query") {
    val stale = manifest.keySet -- rowsOnly
    assert(stale.isEmpty,
      s"TWINS.json entries that are not (or no longer) rows-only queries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every listed twin is a live, ORACLE-CHECKED query") {
    val bad = manifest.toSeq.flatMap { case (q, (twins, _)) =>
      twins.collect {
        case t if !SparkEntry.queries.contains(t) => s"$q -> $t (no query)"
        case t if !SparkEntry.oracleSql.contains(t) => s"$q -> $t (no oracle)"
      }
    }
    assert(bad.isEmpty, s"twin links that are not oracle-green candidates: " +
      bad.mkString("; "))
  }

  test("every entry names at least one twin and one pinning spec") {
    val empty = manifest.collect {
      case (q, (twins, _)) if twins.isEmpty => s"$q (no twins)"
      case (q, (_, specs)) if specs.isEmpty => s"$q (no pinning specs)"
    }
    assert(empty.isEmpty, empty.mkString("; "))
  }

  test("COVERAGE_TABLE.md is regenerated for the current query set") {
    val f = new java.io.File("COVERAGE_TABLE.md")
    assert(f.isFile, "COVERAGE_TABLE.md missing — run " +
      """sbt "runMain graft.tools.CoverageTable"""")
    val rows = java.nio.file.Files.readAllLines(f.toPath).asScala
      .filter(_.startsWith("| `q"))
      .map(_.split("`")(1)).toSet
    val queries = SparkEntry.queries.keySet
    val missing = (queries -- rows).toSeq.sorted.mkString(",")
    val extra = (rows -- queries).toSeq.sorted.mkString(",")
    assert(rows == queries,
      s"stale COVERAGE_TABLE.md (missing: $missing; extra: $extra) — " +
        "regenerate with sbt \"runMain graft.tools.CoverageTable\"")
  }

  test("pinning specs reference real suites (and real test titles)") {
    val srcDir = new java.io.File("src/test/scala/graft")
    manifest.foreach { case (q, (_, specs)) =>
      specs.foreach { ref =>
        val parts = ref.split(": ", 2)
        assert(parts.length == 2,
          s"$q: pinning spec '$ref' must be '<SuiteName>: <test title>'")
        val (suite, title) = (parts(0), parts(1))
        // the suite class must exist on the test classpath
        val cls = try Class.forName(s"graft.$suite")
          catch { case _: ClassNotFoundException =>
            fail(s"$q: pinning spec suite graft.$suite does not exist") }
        assert(classOf[AnyFunSuite].isAssignableFrom(cls),
          s"$q: graft.$suite is not a test suite")
        // and, when the source tree is present (sbt runs from repo root),
        // the quoted title must appear verbatim in the suite's source
        val srcFile = new java.io.File(srcDir, s"$suite.scala")
        if (srcFile.isFile) {
          val src = java.nio.file.Files.readString(srcFile.toPath)
          assert(src.contains(title),
            s"$q: test title not found in $suite.scala: '$title'")
        }
      }
    }
  }
}

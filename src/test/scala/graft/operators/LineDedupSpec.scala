package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CCNet-style corpus-wide line dedup ([[PipelineOps.lineDedup]]):
  * keep-first semantics by (doc_id, position), blank-line handling, doc
  * dropping when nothing survives, and within-doc repeats.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, String)] =
    PipelineOps.lineDedup(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("a line repeated across documents survives only in the smallest doc_id") {
    val got = run(Seq(
      1L -> "banner\nalpha body",
      2L -> "banner\nbeta body",
      3L -> "banner\ngamma body"))
    assert(got(1L) == (2L, "banner\nalpha body"))
    assert(got(2L) == (1L, "beta body"))
    assert(got(3L) == (1L, "gamma body"))
  }

  test("within one document a repeated line keeps only its first position") {
    val got = run(Seq(7L -> "x\ny\nx\nz\nx"))
    assert(got(7L) == (3L, "x\ny\nz"))
  }

  test("blank lines are dropped, never treated as corpus duplicates") {
    val got = run(Seq(
      1L -> "a\n\n  \nb",
      2L -> "\nc\n "))
    assert(got(1L) == (2L, "a\nb"))
    assert(got(2L) == (1L, "c"))
  }

  test("a document whose every line is a repeat disappears") {
    val got = run(Seq(
      1L -> "only\nlines",
      2L -> "only\nlines"))
    assert(got.keySet == Set(1L))
    assert(got(1L) == (2L, "only\nlines"))
  }

  test("first occurrence ranks by doc_id THEN position (cross-doc tie shape)") {
    // "dup" sits at pos 2 of doc 1 and pos 0 of doc 5: doc 1 wins even
    // though doc 5's occurrence is earlier within its own text
    val got = run(Seq(
      1L -> "u1\nu2\ndup",
      5L -> "dup\nu3"))
    assert(got(1L) == (3L, "u1\nu2\ndup"))
    assert(got(5L) == (1L, "u3"))
  }

  test("surviving lines keep their original relative order") {
    val got = run(Seq(
      1L -> "k1\nk2",
      2L -> "z9\nk1\na0\nk2\nm5"))
    assert(got(2L) == (3L, "z9\na0\nm5"))
  }

  test("dropBoilerplateLines: hot lines vanish everywhere, rare repeats survive") {
    val docs = Seq(
      (1L, "banner\nbody one\nshared quote"),
      (2L, "banner\nbody two\nshared quote"),
      (3L, "banner\nbody three")).toDF("doc_id", "text")
    val got = PipelineOps.dropBoilerplateLines(docs, maxDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // df(banner)=3 -> dropped everywhere; df(shared quote)=2 -> kept in BOTH
    assert(got(1L) == (2L, "body one\nshared quote"))
    assert(got(2L) == (2L, "body two\nshared quote"))
    assert(got(3L) == (1L, "body three"))
    // a doc that is ALL chrome disappears
    val got2 = PipelineOps.dropBoilerplateLines(
      (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq :+
        (4L -> "banner")).toDF("doc_id", "text"), maxDf = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L, 3L))
  }

  test("plan shape: no broadcast hint, no driver-materialized relation") {
    // at toy scale the planner may legitimately pick a stats-driven
    // broadcast join; the anti-pattern lineDedup must never exhibit is an
    // EXPLICIT broadcast() hint (forces driver materialization regardless
    // of size) or a collected LocalRelation
    val docs = spark.range(200).select(
      $"id".as("doc_id"),
      concat_ws("\n", lit("shared header"), concat(lit("body-"), $"id")).as("text"))
    val out = PipelineOps.lineDedup(docs)
    val hints = out.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"lineDedup must not hint-broadcast the corpus: $hints")
    val localScans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(localScans.isEmpty,
      s"lineDedup must not materialize driver-side relations: $localScans")
  }
}

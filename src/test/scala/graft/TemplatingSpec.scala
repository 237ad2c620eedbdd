package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Templating

/** P5 templating conventions: E5 prefixes, nomic search prefixes, and
  * the Qwen3 instruct template. */
class TemplatingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def render(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.as("t")).head().getString(0)

  test("E5 prefixes (README.md:128-134)") {
    assert(render(Templating.asQuery(lit("x"))) == "query: x")
    assert(render(Templating.asPassage(lit("x"))) == "passage: x")
  }

  test("nomic search prefixes (tests/nomic_v2_moe.rs:19-27)") {
    assert(render(Templating.asSearchQuery(lit("x"))) == "search_query: x")
    assert(render(Templating.asSearchDocument(lit("x"))) == "search_document: x")
  }

  test("Qwen3 instruct template: newline before Query, NO space after the colon") {
    assert(render(Templating.asInstruct("do the task", lit("x"))) ==
      "Instruct: do the task\nQuery:x")
  }
}

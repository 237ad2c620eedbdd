package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prefix / prompt templating (P5) — the reference's caller conventions:
  * the E5-style `"query: "` / `"passage: "` prefixes for asymmetric
  * retrieval models (/root/reference/README.md:128-134), and the Qwen3
  * embedding instruct template
  * `"Instruct: {task}\nQuery:{query}"` its reference-score test wires
  * (/root/reference/tests/qwen3.rs:67-74 — note: NO space after
  * `Query:`). Plain string concats, surfaced as named combinators so
  * pipelines read like the convention. */
object Templating {
  val QueryPrefix = "query: "
  val PassagePrefix = "passage: "

  def withPrefix(text: Column, prefix: String): Column = concat(lit(prefix), text)
  def asQuery(text: Column): Column = withPrefix(text, QueryPrefix)
  def asPassage(text: Column): Column = withPrefix(text, PassagePrefix)

  /** Nomic-style asymmetric prefixes
    * (tests/nomic_v2_moe.rs:19-27): `search_query: ` on the query
    * side, `search_document: ` on the corpus side. */
  val SearchQueryPrefix = "search_query: "
  val SearchDocumentPrefix = "search_document: "
  def asSearchQuery(text: Column): Column = withPrefix(text, SearchQueryPrefix)
  def asSearchDocument(text: Column): Column = withPrefix(text, SearchDocumentPrefix)

  /** The reference test's retrieval task instruction (qwen3.rs:66). */
  val DefaultTask =
    "Given a web search query, retrieve relevant passages that answer the query"

  /** Qwen3-Embedding instruction template (tests/qwen3.rs:67-74):
    * queries carry the task instruction, documents embed bare. */
  def asInstruct(task: String, query: Column): Column =
    concat(lit("Instruct: " + task + "\nQuery:"), query)
}

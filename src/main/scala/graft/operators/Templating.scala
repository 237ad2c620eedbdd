package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prefix / prompt templating (P5) — the reference's caller convention of
  * prepending `"query: "` / `"passage: "` for asymmetric retrieval models
  * (/root/reference/README.md:128-134). A plain string concat, surfaced
  * as named combinators so pipelines read like the convention. */
object Templating {
  val QueryPrefix = "query: "
  val PassagePrefix = "passage: "

  def withPrefix(text: Column, prefix: String): Column = concat(lit(prefix), text)
  def asQuery(text: Column): Column = withPrefix(text, QueryPrefix)
  def asPassage(text: Column): Column = withPrefix(text, PassagePrefix)
}

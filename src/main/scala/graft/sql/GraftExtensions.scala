package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._
import graft.operators.TextAnalysis

/** SQL surface for the native kernels: every custom Catalyst expression
  * registered as a `graft_*` SQL function, so the whole engine is usable
  * from `spark.sql(...)` (and from SQL-only clients) without touching
  * the Scala API.
  *
  * Two registration routes:
  *  - config: `spark.sql.extensions=graft.sql.GraftExtensions`
  *    (applies at session build — the standard extensions mechanism)
  *  - live session: [[GraftFunctions.register]] (temp functions)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  /** name → expression builder for every exposed kernel. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_token_ids" -> {
      case Seq(text) => TokenIds(text, K.MaxLength)
      case Seq(text, n) => TokenIds(text, intArg(n, "max_length"))
      case _ => throw new IllegalArgumentException("graft_token_ids(text[, max_length])")
    },
    "graft_wordpiece_ids" -> {
      case Seq(text) => WordPieceIds(text, graft.model.WordPiece.fixture)
      case _ => throw new IllegalArgumentException("graft_wordpiece_ids(text)")
    },
    "graft_cosine" -> {
      case Seq(a, b) => CosineSim(a, b)
      case _ => throw new IllegalArgumentException("graft_cosine(a, b)")
    },
    "graft_pooled_sums" -> {
      case Seq(tids, d) => PooledSums(tids, intArg(d, "dim"))
      case _ => throw new IllegalArgumentException("graft_pooled_sums(tids, dim)")
    },
    "graft_simhash" -> {
      case Seq(tids) => SimhashSig(tids, 60) // scale-safe default, like Dedup.simhash
      case Seq(tids, b) => SimhashSig(tids, intArg(b, "bits"))
      case _ => throw new IllegalArgumentException("graft_simhash(tids[, bits])")
    },
    "graft_shingles" -> {
      case Seq(tids, n) => Shingles(tids, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("graft_shingles(tids, n)")
    },
    "graft_sparse_pairs" -> {
      case Seq(tids) => SparsePairs(tids, -1L)
      case Seq(tids, m) => SparsePairs(tids, intArg(m, "min_id_exclusive").toLong)
      case _ => throw new IllegalArgumentException("graft_sparse_pairs(tids[, min_id_exclusive])")
    },
    "graft_maxsim" -> {
      case Seq(q, d) => MaxSim(q, d)
      case _ => throw new IllegalArgumentException("graft_maxsim(query_vecs, doc_vecs)")
    },
    "graft_jaccard" -> {
      case Seq(a, b) => TokenSetJaccard(a, b)
      case _ => throw new IllegalArgumentException("graft_jaccard(tids_a, tids_b)")
    },
    "graft_lang_id" -> {
      case Seq(text) => LangId(text, TextAnalysis.markers)
      case _ => throw new IllegalArgumentException("graft_lang_id(text)")
    },
    "graft_text_norm" -> {
      case Seq(text) => TextNorm(text, TextAnalysis.stopwords)
      case _ => throw new IllegalArgumentException("graft_text_norm(text)")
    })

  /** Register everything on a live session as temp functions. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}

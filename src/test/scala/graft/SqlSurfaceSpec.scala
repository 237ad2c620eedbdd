package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Kernel

/** The graft_* SQL function surface: results must equal the Column API. */
class SqlSurfaceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  graft.sql.GraftFunctions.register(spark)

  test("graft_cosine / graft_token_ids from pure SQL") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "graft_token_ids('Hello, World!') AS t").head()
    assert(r.getDouble(0) == 1.0)
    val viaApi = spark.range(1)
      .select(Kernel.tokenIds(lit("Hello, World!")).as("t"))
      .head().getSeq[Long](0)
    assert(r.getSeq[Long](1) == viaApi)
  }

  test("full dense pipeline expressible in one SQL statement") {
    Seq((0L, "spark hash join"), (1L, "broadcast the small side"))
      .toDF("doc_id", "text").createOrReplaceTempView("graft_sql_docs")
    val sql = spark.sql(
      """SELECT doc_id, graft_pooled_sums(graft_token_ids(text), 8) AS sums
         FROM graft_sql_docs""").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val api = Seq((0L, "spark hash join"), (1L, "broadcast the small side"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Kernel.pooledSums(Kernel.tokenIds(col("text")), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(sql == api)
  }

  test("graft_* reject wrong-typed args at analysis time, not mid-query") {
    import org.apache.spark.sql.AnalysisException
    // each of these used to surface as a runtime ClassCastException /
    // codegen failure; ExpectsInputTypes turns them into AnalysisException
    intercept[AnalysisException](spark.sql("SELECT graft_cosine('a', 'b')").collect())
    intercept[AnalysisException](spark.sql("SELECT graft_token_ids(array(1, 2))").collect())
    intercept[AnalysisException](spark.sql("SELECT graft_simhash('abc')").collect())
    intercept[AnalysisException](spark.sql("SELECT graft_maxsim(array(1), array(2))").collect())
    intercept[AnalysisException](
      spark.sql("SELECT graft_jaccard('a', array(1))").collect())
    intercept[AnalysisException](
      spark.sql("SELECT graft_pooled_sums(array('x'), 8)").collect())
    // ...while SAFE implicit casts still work like any built-in: int
    // arrays upcast to bigint, NULL propagates
    assert(spark.sql("SELECT graft_shingles(array(1, 2, 3), 2) AS s").head()
      .getSeq[Long](0).length == 2)
    assert(spark.sql("SELECT graft_simhash(graft_token_ids(CAST(NULL AS STRING))) IS NULL")
      .head().getBoolean(0))
  }

  test("graft_simhash, graft_shingles, graft_lang_id, graft_text_norm, graft_sparse_pairs") {
    val r = spark.sql(
      """SELECT graft_simhash(graft_token_ids('a b c d')) AS sh,
                graft_shingles(graft_token_ids('a b c d'), 2) AS sg,
                graft_lang_id('the of and is in').lang_pred AS lang,
                graft_text_norm('Hello,   World!').n_words AS nw,
                size(graft_sparse_pairs(graft_token_ids('a b c d e f g h'))) AS np""").head()
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[Long](1).length == 3)
    assert(r.getString(2) == "en")
    assert(r.getLong(3) == 2L)
    // equality with the Column API is the real check (relu may drop all
    // occurrences of a short text)
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val api = spark.range(1).select(size(bridge.column(
      graft.functions.SparsePairs(
        bridge.expression(Kernel.tokenIds(lit("a b c d e f g h"))), -1L))).as("n"))
      .head().getInt(0)
    assert(r.getInt(4) == api)
  }

  test("extensions class wires the same builders (session-build route)") {
    // the injectFunction route needs a fresh session; assert the catalog
    // of builders is identical to what register() used, and that each
    // builder constructs a working expression
    assert(graft.sql.GraftFunctions.all.map(_._1).toSet == Set(
      "graft_token_ids", "graft_wordpiece_ids", "graft_cosine",
      "graft_pooled_sums", "graft_simhash", "graft_shingles",
      "graft_sparse_pairs", "graft_lang_id", "graft_text_norm",
      "graft_maxsim", "graft_jaccard"))
    val ms = spark.sql(
      """SELECT graft_maxsim(array(array(1.0D, 0.0D)), array(array(0.5D, 0.5D))) AS m,
                graft_jaccard(array(1, 2, 2), array(2, 3)) AS j""").head()
    assert(ms.getDouble(0) == 0.5 && ms.getDouble(1) == 1.0 / 3.0)
    val ext = new graft.sql.GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw
  }
}

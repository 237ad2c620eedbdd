package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Similarity-kernel fixtures from the reference's inline unit tests
  * (/root/reference/src/similarity.rs:42-72, mirrored in FIXTURES.md §9). */
class KernelSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("dot: q·[2,3,4] == 2.0 for q=[1,0,0]") {
    assert(eval1(Kernel.dot(lit(Array(1.0, 0.0, 0.0)), lit(Array(2.0, 3.0, 4.0)))) == 2.0)
  }

  test("cosine fixtures incl. zero-vector guard") {
    val q = lit(Array(1.0, 0.0, 0.0))
    assert(eval1(Kernel.cosine(q, lit(Array(1.0, 0.0, 0.0)))) == 1.0)
    assert(eval1(Kernel.cosine(q, lit(Array(-1.0, 0.0, 0.0)))) == -1.0)
    assert(eval1(Kernel.cosine(q, lit(Array(0.0, 1.0, 0.0)))) == 0.0)
    // zero-vector guard: 0.0, not NaN (src/similarity.rs:19-26)
    assert(eval1(Kernel.cosine(q, lit(Array(0.0, 0.0, 0.0)))) == 0.0)
  }

  test("top_k fixture: best-first with scores") {
    val corpus = Seq(
      (0L, Array(0.0, 1.0, 0.0)),
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(0.7, 0.7, 0.0))).toDF("doc_id", "vec")
    val top = graft.operators.Similarity
      .topK(corpus, "vec", "doc_id", Seq(1.0, 0.0, 0.0), 2)
      .collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top(0).getDouble(1) == 1.0)
    assert(math.abs(top(1).getDouble(1) - math.sqrt(0.5)) < 1e-12)
  }

  test("polyHash matches the DuckDB formula on 'hello'") {
    // independently computed: fold (a*31+ascii(c)) % 1000003 over h,e,l,l,o
    val expected = "hello".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % K.M)
    assert(eval1(Kernel.polyHash(lit("hello"))) == expected)
    assert(expected == 162025L) // cross-checked against DuckDB 1.0
  }

  test("tokens: lowercase, punctuation stripped, empties dropped") {
    val got = eval1(Kernel.tokens(lit("  Hello, World!  spark-SQL 42 ")))
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(got == List("hello", "world", "spark", "sql", "42"))
  }

  test("tokenIds truncates at maxLength (P3 semantics)") {
    val got = eval1(Kernel.tokenIds(lit("a b c d e f"), maxLen = 3))
      .asInstanceOf[scala.collection.Seq[Long]].toList
    assert(got.length == 3)
  }

  test("native TokenIds expression == HOF formulation on real corpus + edge cases") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, ""), (9002L, "   "), (9003L, "...!!!"),
        (9004L, "MiXeD CaSe-42 und Öäü"), (9005L, "a"),
        (9006L, "x " * 600), // > maxLength tokens
        // Unicode chars whose lowercase lands in [a-z0-9]: Kelvin sign
        // U+212A → 'k'; dotted capital I U+0130 → "i" + combining dot
        // token-dense U+0130 runs: each char emits a token with no
        // separator (regression: output buffer must size to char count)
        (9008L, "İİİ"), (9009L, "İ" * 40),
        (9007L, "worKd İstanbul AKB İİ")
      ).toDF("doc_id", "text"))
    val cmp = docs
      .withColumn("fast", Kernel.tokenIds(col("text")))
      .withColumn("hof", Kernel.tokenIdsHof(col("text")))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
    // truncation agreement at a small cap
    val cmp2 = docs
      .withColumn("fast", Kernel.tokenIds(col("text"), 3))
      .withColumn("hof", Kernel.tokenIdsHof(col("text"), 3))
      .filter(not(col("fast") === col("hof")))
    assert(cmp2.count() == 0)
  }

  test("native PooledSums == HOF formulation on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
    val cmp = docs
      .withColumn("fast", Kernel.pooledSums(col("tids"), 64))
      .withColumn("hof", Kernel.pooledSumsHof(col("tids"), 64))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("native MatVecQ == HOF formulation on real corpus") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val dimIn = 8
    val dimOut = 5
    val wq = IndexedSeq.tabulate(dimOut * dimIn)(i => (i * 7 - 13).toLong)
    val wLit = array(wq.map(lit): _*)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
      .withColumn("sums", Kernel.pooledSums(col("tids"), dimIn))
    val cmp = docs
      .withColumn("fast", bridge.column(graft.functions.MatVecQ(
        bridge.expression(col("sums")), wq, dimIn, dimOut)))
      .withColumn("hof",
        transform(sequence(lit(0), lit(dimOut - 1)), d =>
          aggregate(sequence(lit(0), lit(dimIn - 1)), lit(0L),
            (acc, e) => acc + element_at(col("sums"), e + 1) *
              element_at(wLit, d * lit(dimIn) + e + 1))))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("native SparseDotQ == HOF formulation on real corpus") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.K
    val wq = IndexedSeq.tabulate(64)(i => (i * 11 - 300).toLong)
    val wLit = array(wq.map(lit): _*)
    val hidden = (d: org.apache.spark.sql.Column) =>
      ((col("token_id") % lit(K.M3)) * lit(K.A3) +
        d.cast("long") * lit(K.B3) +
        (col("pos") + lit(1L)) * lit(K.C3)) % lit(K.M3)
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), posexplode(Kernel.tokenIds(col("text"))).as(Seq("pos", "token_id")))
    val cmp = toks
      .withColumn("fast", bridge.column(graft.functions.SparseDotQ(
        bridge.expression(col("token_id")),
        bridge.expression(col("pos").cast("long")), wq)))
      .withColumn("hof",
        aggregate(sequence(lit(0), lit(wq.length - 1)), lit(0L),
          (acc, d) => acc + hidden(d) * element_at(wLit, d + 1)))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("native SimhashSig == HOF formulation on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val cmp = docs
      .withColumn("fast", bridge.column(
        graft.functions.SimhashSig(bridge.expression(col("tids")), 32)))
      .withColumn("hof", graft.operators.Dedup.simhashSigHof(col("tids"), 32))
      .filter(col("fast") =!= col("hof"))
    assert(cmp.count() == 0)
  }

  test("native CosineSim == HOF formulation on real float embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val cmp = a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("fast", Kernel.cosine(col("ea"), col("eb")))
      .withColumn("hof", Kernel.cosineHof(col("ea"), col("eb")))
      .filter(not(col("fast") === col("hof"))) // bitwise: NaN-safe not needed, no NaNs
    assert(cmp.count() == 0)
  }

  test("factored cosine (DotProd/VecNorm via cosinePre) == fused CosineSim, bit-exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val cmp = a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("fused", Kernel.cosine(col("ea"), col("eb")))
      .withColumn("factored", Kernel.cosinePre(col("ea"), col("eb"),
        Kernel.vecNorm(col("ea")), Kernel.vecNorm(col("eb"))))
      .filter(not(col("fused") === col("factored")))
    assert(cmp.count() == 0)
    // zero-vector guard: both forms return exactly 0.0
    import spark.implicits._
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("za", "zb")
      .withColumn("fused", Kernel.cosine(col("za"), col("zb")))
      .withColumn("factored", Kernel.cosinePre(col("za"), col("zb"),
        Kernel.vecNorm(col("za")), Kernel.vecNorm(col("zb"))))
      .head()
    assert(z.getDouble(2) == 0.0 && z.getDouble(3) == 0.0)
  }

  test("native Shingles == HOF formulation on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) >= 3)
    val cmp = docs
      .withColumn("fast", graft.operators.Dedup.shingles(col("tids"), 3))
      .withColumn("hof", graft.operators.Dedup.shinglesHof(col("tids"), 3))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("native TokenVec == HOF formulation on real corpus") {
    val ce = graft.operators.ColbertEmbedder
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), posexplode(Kernel.tokenIds(col("text"))).as(Seq("pos", "tid")))
      .filter(col("pos") >= 1)
    val cmp = docs
      .withColumn("fast", ce.tokenVector(col("tid"), col("pos"), 16))
      .withColumn("hof", ce.tokenVectorHof(col("tid"), col("pos"), 16))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("native TokenSetJaccard == distinct/intersect/union HOF chain") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("a", Kernel.tokenIds(col("text")))
      .withColumn("b", Kernel.tokenIds(reverse(col("text"))))
    val hof = {
      val inter = size(array_intersect(array_distinct(col("a")), array_distinct(col("b"))))
      val union = size(array_union(array_distinct(col("a")), array_distinct(col("b"))))
      when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union.cast("double"))
    }
    val cmp = docs
      .withColumn("fast", bridge.column(graft.functions.TokenSetJaccard(
        bridge.expression(col("a")), bridge.expression(col("b")))))
      .withColumn("hof", hof)
      .filter(col("fast") =!= col("hof"))
    assert(cmp.count() == 0)
  }

  test("native LangId == HOF formulation on real corpus + edge cases") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, ""), (9002L, "der die und le la de de de"),
        (9003L, "THE QUICK BROWN FOX el la de y que en un"),
        (9004L, "zh-ish de shi bu le wo you he 标记")
      ).toDF("doc_id", "text"))
    val fast = graft.operators.TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val hof = graft.operators.TextAnalysis.langIdHof(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fast == hof)
  }

  test("native TextNorm paths (exact dedup, quality) == HOF formulations") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, ""), (9002L, " A!  b? "), (9003L, "The of and IS in... on at"),
        (9004L, "Öäü xy 42")
      ).toDF("doc_id", "text"))
    val ops = graft.operators.Dedup
    def dSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(dSet(ops.exact(docs, "doc_id", "text")) == dSet(ops.exactHof(docs, "doc_id", "text")))
    val ta = graft.operators.TextAnalysis
    def qMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(qMap(ta.quality(docs, "doc_id", "text")) == qMap(ta.qualityHof(docs, "doc_id", "text")))
  }

  test("l2normalize yields unit norm with 1e-12 epsilon") {
    val n = eval1(Kernel.l2norm(Kernel.l2normalize(lit(Array(3.0, 4.0)))))
      .asInstanceOf[Double]
    assert(math.abs(n - 1.0) < 1e-9)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}
import graft.operators.{Pooling, TextEmbedder}
import graft.backend.{BackendEmbedder, HashingBackend}

/** Metamorphic + structural properties of the dense pipeline, mirroring
  * the reference's invariance tests (FIXTURES.md §7):
  * determinism (tests/text-embeddings.rs:605-622), batch-size invariance
  * (tests/text-embeddings.rs:494-523) ≙ repartition invariance here. */
class EmbedderSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val docs = Seq(
    (0L, "Hello, World!"),
    (1L, "This is an example passage."),
    (2L, "fastembed-rs is licensed under Apache-2.0"),
    (3L, "Some other short text here blah blah blah")).toDF("doc_id", "text")

  private def embAsMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap

  test("chunkEmbed: stride layout, end-stop rule, unit embeddings") {
    // 40 tokens, budget 16, overlap 4 → starts 0/12/24 (start 36 is
    // suppressed: the chunk at 24 already reaches the end, so a 4-token
    // tail would be a strict subset of it)
    val d = Seq((0L, (1 to 40).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextEmbedder.chunkEmbed(d, "doc_id", "text", budget = 16, overlap = 4, dim = 8)
      .collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ==
      Seq((0L, 16L), (1L, 16L), (2L, 16L)))
    // 41 tokens: the window at 24 covers to 40 only → a tail chunk at 36
    // (5 tokens, not a subset) IS emitted
    val d2 = Seq((0L, (1 to 41).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val out2 = TextEmbedder.chunkEmbed(d2, "doc_id", "text", budget = 16, overlap = 4, dim = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(out2 == Seq((0L, 16L), (1L, 16L), (2L, 16L), (3L, 5L)))
    out.foreach { r =>
      val v = r.getSeq[Double](3)
      assert(v.length == 8)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("dense embedding: dim, unit norm, determinism") {
    val e = TextEmbedder().embed(docs, "text", "emb").select($"doc_id", $"emb")
    val m1 = embAsMap(e)
    val m2 = embAsMap(e) // re-run the same plan
    assert(m1.keySet == Set(0L, 1L, 2L, 3L))
    assert(m1.values.forall(_.length == K.Dim))
    m1.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    assert(m1 == m2)
  }

  test("repartition invariance (batch-size invariance analogue)") {
    val e1 = embAsMap(TextEmbedder().embed(docs.repartition(1), "text", "emb").select($"doc_id", $"emb"))
    val e8 = embAsMap(TextEmbedder().embed(docs.repartition(8), "text", "emb").select($"doc_id", $"emb"))
    assert(e1 == e8)
  }

  test("pooling variants differ and all normalize") {
    val mean = embAsMap(TextEmbedder(pooling = Pooling.Mean).embed(docs, "text", "emb").select($"doc_id", $"emb"))
    val cls = embAsMap(TextEmbedder(pooling = Pooling.Cls).embed(docs, "text", "emb").select($"doc_id", $"emb"))
    val last = embAsMap(TextEmbedder(pooling = Pooling.Last).embed(docs, "text", "emb").select($"doc_id", $"emb"))
    assert(mean(3L) != cls(3L))
    assert(cls(3L) != last(3L)) // first token != last token for doc 3
  }

  test("truncation: maxLength=2 uses only the first two tokens") {
    val full = embAsMap(TextEmbedder(maxLength = 2).embed(docs, "text", "emb").select($"doc_id", $"emb"))
    val manual = embAsMap(
      TextEmbedder().embed(
        Seq((3L, "some other")).toDF("doc_id", "text"), "text", "emb").select($"doc_id", $"emb"))
    assert(full(3L) == manual(3L))
  }

  test("mapPartitions backend path is bit-identical to the SQL path") {
    val sql = embAsMap(TextEmbedder().embed(docs, "text", "emb").select($"doc_id", $"emb"))
    val withTids = docs
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
      .select(col("doc_id"), col("tids"))
    val be = embAsMap(
      BackendEmbedder.embed(withTids, "doc_id", "tids", HashingBackend(K.Dim))
        .select(col("doc_id"), col("embedding")))
    assert(sql == be)
  }

  test("fromModel wires registry dim/pooling; unknown model throws") {
    val cls = embAsMap(TextEmbedder.fromModel("graft-hash-64-cls")
      .embed(docs, "text", "emb").select($"doc_id", $"emb"))
    val direct = embAsMap(TextEmbedder(pooling = Pooling.Cls)
      .embed(docs, "text", "emb").select($"doc_id", $"emb"))
    assert(cls == direct)
    val wide = TextEmbedder.fromModel("graft-hash-128-mean")
    assert(wide.dim == 128)
    intercept[NoSuchElementException](TextEmbedder.fromModel("nope"))
  }

  test("Dynamic quantization forces single-partition execution, same results") {
    val dyn = TextEmbedder.fromModel("graft-hash-64-mean-dynq")
    assert(dyn.quantization == graft.model.Quantization.Dynamic)
    val out = dyn.embed(docs.repartition(8), "text", "emb")
    assert(out.rdd.getNumPartitions == 1) // whole-input-batch rule
    assert(embAsMap(out.select($"doc_id", $"emb")) ==
      embAsMap(TextEmbedder().embed(docs, "text", "emb").select($"doc_id", $"emb")))
  }

  test("tokenizer config: min(user, model) truncation, sentinel max, pad fields") {
    import graft.model.TokenizerConfig
    val cfg = TokenizerConfig.fromJson(
      """{"model_max_length": 128, "pad_token": "<pad>", "pad_token_id": 1}""")
    assert(cfg.modelMaxLength == 128L && cfg.padToken == "<pad>" && cfg.padTokenId == 1L)
    assert(cfg.effectiveMaxLength(512) == 128) // model caps user
    assert(cfg.effectiveMaxLength(64) == 64) // user caps model
    // BGEBaseSmall-style sentinel: 1000000000000000019884624838656
    val big = TokenizerConfig.fromJson(
      """{"model_max_length": 1000000000000000019884624838656}""")
    assert(big.effectiveMaxLength(512) == 512)
    intercept[IllegalArgumentException](TokenizerConfig.fromJson("{}"))
  }

  test("output-key precedence: OnlyOne → by-name → by-order, override first") {
    import graft.backend.OutputPrecedence.select
    assert(select(Seq("whatever")) == "whatever") // OnlyOne
    assert(select(Seq("last_hidden_state", "text_embeds")) == "text_embeds")
    assert(select(Seq("logits", "last_hidden_state")) == "last_hidden_state")
    assert(select(Seq("a", "b")) == "a") // by-order fallback
    assert(select(Seq("last_hidden_state", "sentence_embedding"),
      overrideKey = Some("sentence_embedding")) == "sentence_embedding") // Gemma-style
    assert(select(Seq("x", "y"), overrideKey = Some("missing")) == "x")
  }

  test("raw-backend transform hook: pooled route bit-equal, token route shaped") {
    import graft.backend.{HashingBackend, HashingRawBackend, RawBackendEmbedder}
    val withTids = docs
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
      .select(col("doc_id"), col("tids"))
    // text_embeds route + identity transform == the plain backend path
    val viaRaw = embAsMap(RawBackendEmbedder.embedWith(
      withTids, "doc_id", "tids", HashingRawBackend(K.Dim),
      transform = m => m(0), outputKey = Some("text_embeds")))
    val plain = embAsMap(BackendEmbedder.embed(withTids, "doc_id", "tids", HashingBackend(K.Dim))
      .select(col("doc_id"), col("embedding")))
    assert(viaRaw == plain)
    // last_hidden_state route: user closure sees [tokens × dim]
    val firstTok = RawBackendEmbedder.embedWith(
      withTids, "doc_id", "tids", HashingRawBackend(K.Dim),
      transform = m => m.head, outputKey = Some("last_hidden_state"))
    assert(firstTok.collect().forall(_.getSeq[Double](1).length == K.Dim))
  }

  test("by-position precedence fallback uses DECLARATION order, not name order") {
    import graft.backend.{RawBackend, RawBackendEmbedder}
    // neither name is in the precedence list; "zzz_first" is declared
    // first and must win despite sorting last alphabetically
    val be = new RawBackend {
      val dim = 2
      def forwardBatch(batch: Seq[Array[Long]]) = Seq(
        "zzz_first" -> batch.map(_ => Array(Array(1.0, 1.0))),
        "aaa_second" -> batch.map(_ => Array(Array(2.0, 2.0))))
    }
    val df = docs.withColumn("tids", Kernel.tokenIds(col("text")))
      .select(col("doc_id"), col("tids"))
    val out = RawBackendEmbedder.embedWith(df, "doc_id", "tids", be, m => m.head)
      .collect()
    assert(out.forall(_.getSeq[Double](1) == Seq(1.0, 1.0)))
  }

  test("length-bucketed backend path: identical results, sorted micro-batches") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
      .select(col("doc_id"), col("tids"))
    val plain = embAsMap(BackendEmbedder.embed(real, "doc_id", "tids", HashingBackend())
      .select(col("doc_id"), col("embedding")))
    val bucketed = embAsMap(
      BackendEmbedder.embedLengthBucketed(real, "doc_id", "tids", HashingBackend())
        .select(col("doc_id"), col("embedding")))
    assert(plain == bucketed)
  }

  test("padsBatchLongest backends auto-bucket in embed(): same results, plan unchanged") {
    val model = graft.backend.DecoderLayerBackend.fromBank()
    assert(model.padsBatchLongest)
    // a delegate with the flag OFF isolates the bucketing as the only change
    val plainBe = new graft.backend.EmbeddingBackend {
      def dim: Int = model.dim
      def embedBatch(b: Seq[Array[Long]]): Seq[Array[Double]] = model.embedBatch(b)
      override def toString = "unbucketedDelegate"
    }
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tids", Kernel.tokenIds(col("text"), 32))
      .select(col("doc_id"), col("tids"))
    val auto = embAsMap(BackendEmbedder.embed(real, "doc_id", "tids", model, minTokens = 1)
      .select(col("doc_id"), col("embedding")))
    val plain = embAsMap(BackendEmbedder.embed(real, "doc_id", "tids", plainBe, minTokens = 1)
      .select(col("doc_id"), col("embedding")))
    assert(auto == plain)
    assert(auto.nonEmpty)
    // the bucketing lives INSIDE mapPartitions: no Sort, no Exchange,
    // and the tokenizer chain still evaluates exactly once
    val planned = BackendEmbedder.embed(real, "doc_id", "tids", model, minTokens = 1)
    val phys = planned.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"length bucketing must not shuffle:\n$phys")
    assert(!phys.contains("Sort"), s"length bucketing must not sort the partition:\n$phys")
    val occurrences = "tokenids".r
      .findAllIn(planned.queryExecution.optimizedPlan.toString.toLowerCase).size
    assert(occurrences <= 1, s"tokenizer chain must evaluate once, saw $occurrences")
  }

  test("lengthClassed batcher: exact row preservation, class-uniform bounded batches") {
    val rows = (0 until 1000).map { i =>
      (i.toLong, Array.fill[Long]((i * 37) % 64 + 1)(i.toLong))
    }
    val batches = graft.backend.BackendEmbedder
      .lengthClassed(rows.iterator, batchSize = 64).toVector
    // every row exactly once
    assert(batches.flatten.map(_._1).sorted == rows.map(_._1))
    // bounded batches, each of a single width-8 length class
    assert(batches.forall(_.size <= 64))
    assert(batches.forall(b => b.map(_._2.length >> 3).distinct.size == 1))
    // near-uniform: max pad spread within a batch < 8 positions
    assert(batches.forall(b =>
      b.map(_._2.length).max - b.map(_._2.length).min < 8))
  }

  test("backend batch-size invariance (Q6)") {
    val withTids = docs.withColumn("tids", Kernel.tokenIds(col("text")))
      .select(col("doc_id"), col("tids"))
    val b1 = embAsMap(BackendEmbedder.embed(withTids, "doc_id", "tids", HashingBackend(), 1)
      .select(col("doc_id"), col("embedding")))
    val b256 = embAsMap(BackendEmbedder.embed(withTids, "doc_id", "tids", HashingBackend(), 256)
      .select(col("doc_id"), col("embedding")))
    assert(b1 == b256)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Kernel
import graft.operators._

/** Plan-shape assertions for the scale-critical claims: column pruning
  * reaches the scan, small dimensions broadcast, aggregates are partial
  * before the exchange, top-k plans as TakeOrderedAndProject. These are
  * the properties that decide 100 TB behavior — locked in as tests so a
  * refactor can't silently regress them. */
class PlanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("driver contract: every query has an oracle, names aligned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // every declared query is on the HARD gate (no silent rows-only
    // fallbacks), and no oracle is orphaned
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("VL relational queries are narrow codegen'd Column trees") {
    // smart resize, MRoPE ids, pos-embed interpolation: pure arithmetic
    // over the scan — no shuffle, no UDF boundary, inside
    // WholeStageCodegen. These are the claims that let the VL front run
    // as a map-only stage over a 100 TB scan.
    Seq("q69b_smart_resize", "q73_mrope_ids", "q74_pos_interp").foreach { name =>
      val plan = planOf(SparkEntry.queries(name)(spark, dir))
      assert(!plan.contains("Exchange"), s"$name must not shuffle:\n$plan")
      // "*(n)" prefixes mark WholeStageCodegen stages in executedPlan
      assert(plan.contains("*(1)"), s"$name fell out of codegen:\n$plan")
      assert(!plan.contains("BatchEval") && !plan.contains("ScalaUDF"),
        s"$name must not use a UDF:\n$plan")
    }
  }

  test("dense embed: scan prunes to (doc_id, text) out of 5 columns") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.schema.fields.length == 5)
    val plan = TextEmbedder().embed(docs.select(col("doc_id"), col("text")), "text", "emb")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected pruned scan:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("dfWeighted: skew-safe partial aggs, no per-token window, footer-only n_docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = planOf(SparseEmbedder.dfWeighted(docs, "doc_id", "text"))
    // NO window: a count window partitioned by token would buffer a
    // stopword's whole (doc, token) group in one task at scale
    assert(!plan.contains("Window"), s"df must not come from a window:\n$plan")
    // the in-plan n_docs count is a footer-only scan (empty ReadSchema),
    // not a driver-side count() action
    assert("ReadSchema: struct<>".r.findAllIn(plan).length == 1,
      s"expected a footer-only count scan:\n$plan")
    // stats ride a broadcast back onto the weights
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"df stats must broadcast:\n$plan")
  }

  test("graft operators broadcast their small sides (kNN, IVF probes)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // knnJoin: corpus streams through a broadcast nested-loop join
    val knn = planOf(Similarity.knnJoin(q, "qid", "qv", e, "vec_id", "embedding", 3))
    assert(knn.contains("BroadcastNestedLoopJoin"), s"expected broadcast NLJ:\n$knn")
    // ivfFlat: the probe side broadcasts into an equi-join
    val ivf = planOf(Similarity.ivfFlat(q, "qid", "qv", e, "vec_id", "embedding", 8, 2, 3))
    assert(ivf.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$ivf")
  }

  test("aggregations are partial (map-side combine) before the exchange") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = planOf(li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))))
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // physical plan prints top-down: final agg, exchange, partial agg —
    // a partial HashAggregate must appear BELOW (after) the exchange
    assert(plan.indexOf("HashAggregate", exchange) > exchange,
      s"expected partial aggregate below the exchange:\n$plan")
  }

  test("quantile selection: the corpus side never enters a Window") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("score"))
    val plan = planOf(Sampling.quantileThreshold(docs, "doc_id", "score", 0.25))
    // exactly one Window (over the score histogram), fed by a partial
    // aggregate — the corpus reaches only filters/joins
    assert(plan.sliding("Window".length).count(_ == "Window") >= 1)
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0)
    assert(plan.indexOf("HashAggregate", windowIdx) > windowIdx,
      s"the Window must sit over the aggregated histogram, not raw rows:\n$plan")
    // threshold joins back as a broadcast, not a shuffle of the corpus
    assert(plan.contains("Broadcast"), s"expected broadcast threshold join:\n$plan")
  }

  test("ANN bucket kNN: hash-equi self-join + partial top-k, corpus never broadcast") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = planOf(Similarity.annBucketKnn(e, "vec_id", "embedding", 64, 4, 4))
    // the scale contract q116 exists for: candidates come from an
    // equi-join on the bucket key, NOT a broadcast/cross of the corpus
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"ANN candidate pass must not broadcast or cross-join the corpus:\n$plan")
    // an EQUI join on the bucket key — size-based auto-broadcast of a
    // small side is fine (the planner's stats call, not a forced hint;
    // with corpus-sized stats it falls back to a shuffle join), but the
    // join keys must be the buckets
    assert(Seq("BroadcastHashJoin [__bucket", "SortMergeJoin [__bucket",
        "ShuffledHashJoin [__bucket").exists(plan.contains),
      s"expected a bucket-key equi join:\n$plan")
    // top-k is a partial ObjectHashAggregate below the per-vector exchange
    val exchange = plan.indexOf("Exchange hashpartitioning(__id")
    assert(exchange >= 0, s"expected a per-vector-id exchange:\n$plan")
    assert(plan.indexOf("ObjectHashAggregate", exchange) > exchange,
      s"expected partial top-k agg below the exchange:\n$plan")
  }

  test("simhash near-dups: hamming filter sits below the distinct exchange") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.Dedup.simhashNearDupsText(docs, "doc_id", "text"))
    // the r13 scale fix: the dedup (distinct) exchange must carry only
    // pairs that already passed hamming <= maxDist — at 10x corpus the
    // band-collision candidate stream grows ~quadratically while the
    // near-dup result grows ~linearly, so a filter ABOVE the exchange
    // would shuffle the quadratic term
    val exchange = plan.indexOf("Exchange hashpartitioning(id_a")
    assert(exchange >= 0, s"expected the distinct exchange on the pair key:\n$plan")
    val below = plan.substring(exchange)
    assert(below.contains("bit_count") && below.contains("<= 3"),
      s"expected the hamming filter below the distinct exchange:\n$plan")
  }

  test("bm25Search: the score fold is a codegen'd long-sum HashAggregate, not an object agg") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val q = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val plan = planOf(FullText.bm25Search(q, "qid", "qtext", d, "doc_id", "text", 5))
    // the r13 scale fix: the per-(query, doc) score is an exact
    // fixed-point LONG sum — a plain partial HashAggregate with
    // map-side combine. A collect_list/sort_array fold here would plan
    // as ObjectHashAggregate over millions of groups, whose object maps
    // sort-fall-back at scale (measured 7.5x growth for 10x data); the
    // only ObjectHashAggregate allowed in this plan is the k-sized
    // per-query top-k heap ABOVE the (qid, doc) fold
    val fold = plan.indexOf("- HashAggregate(keys=[qid")
    assert(fold >= 0, s"expected a plain (qid, doc) HashAggregate fold:\n$plan")
    assert(!plan.contains("collect_list"),
      s"the score fold must not collect lists:\n$plan")
    assert(plan.toLowerCase.contains("sum(floor("),
      s"expected the fixed-point long sum in the fold:\n$plan")
  }

  test("rerankTopK: partial top-k below the qid exchange, no global sort") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val q = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val plan = planOf(Reranker.rerankTopK(q, "qid", "qtext", d, "doc_id", "text", 10))
    // the scored corpus×queries product must never range-partition or
    // globally sort — only the k-sized per-query heaps reach the exchange
    assert(!plan.contains("rangepartitioning") && !plan.contains("Sort "),
      s"rerankTopK must not sort the scored product:\n$plan")
    val exchange = plan.indexOf("Exchange hashpartitioning(qid")
    assert(exchange >= 0, s"expected a qid exchange:\n$plan")
    assert(plan.indexOf("ObjectHashAggregate", exchange) > exchange,
      s"expected partial top-k agg below the exchange:\n$plan")
  }

  test("q118: candidate-bounded rerank, no corpus cross join") {
    val plan = planOf(SparkEntry.queries("q118_learned_retrieval")(spark, dir))
    // the end-to-end journey must never cross/NLJ-join the corpus: IVF
    // candidates come from the broadcast probe equi-join, and the
    // second (rerank) forward reads only the candidate semi join
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q118 must not cross-join the corpus:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"rerank input must be the candidate semi join:\n$plan")
  }

  test("randomProjection stays a narrow map: no exchange in the plan") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = planOf(e.select(col("vec_id"),
      Similarity.randomProjection(col("embedding"), 64, 16).as("proj")))
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("single-query top-k plans as TakeOrderedAndProject (no full sort)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Seq.fill(64)(0.1)
    val plan = planOf(Similarity.topK(e, "embedding", "vec_id", q, 10))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("joint BGE-M3 sub-struct projection prunes sibling branches") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sparseOnly = Bgem3Embedder.embed(docs, "doc_id", "text")
      .select(col("doc_id"), col("bgem3.sparse").as("sp"))
    val plan = sparseOnly.queryExecution.optimizedPlan.toString
    assert(plan.contains("sparsepairs"), s"sparse branch must remain:\n$plan")
    assert(!plan.contains("pooledsums"), s"dense branch must be pruned:\n$plan")
  }

  test("filters push down to the parquet scan") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = planOf(li.filter(col("l_quantity") > 30.0).select(col("l_orderkey")))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"expected pushed filter:\n$plan")
  }
}

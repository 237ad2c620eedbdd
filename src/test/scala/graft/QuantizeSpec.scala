package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}
import graft.operators.{Quantize, Similarity}

/** Scalar (int8) and binary quantization: code ranges, round-trip error
  * bounds, Hamming properties, rescore recall, and the plan shapes
  * (narrow encodes, partial top-k ranking). */
class QuantizeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val stats = Quantize.sqStats(e, "embedding")

  test("sq codes are int8-range and round-trip within half a step per dim") {
    val st = stats.collect()(0)
    val mins = st.getSeq[Double](0)
    val maxs = st.getSeq[Double](1)
    val codes = Quantize.sqEncode(e, "vec_id", "embedding", stats)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val raw = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(codes.keySet == raw.keySet)
    codes.foreach { case (id, cs) =>
      assert(cs.forall(c => c >= 0L && c <= 255L))
      cs.zipWithIndex.foreach { case (c, d) =>
        val step = (maxs(d) - mins(d)) / 255.0
        val deq = mins(d) + c * step
        // floor(x+0.5) rounding: |v - deq| <= step/2 (+ fp slack)
        assert(math.abs(raw(id)(d) - deq) <= step / 2.0 + 1e-9,
          s"vec $id dim $d: v=${raw(id)(d)} deq=$deq step=$step")
      }
    }
  }

  test("sq search: self-query ranks itself first; ranking close to exact") {
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val codes = Quantize.sqEncode(e, "vec_id", "embedding", stats)
    val got = Quantize.sqSearch(q, "qid", "qv", codes, "vec_id", stats, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.length == 20)
    // int8 dequantization distorts cosine by << the self-similarity gap
    got.filter(_._3 == 1).foreach { case (qid, top1, _, score) =>
      assert(top1 == qid, s"query $qid top-1 was $top1")
      assert(score > 0.999)
    }
    // exact top-1 neighbor survives quantized search's top-5
    val exact = Similarity.knnJoin(q, "qid", "qv", e, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotTop5 = got.map(r => (r._1, r._2)).toSet
    exact.foreach(p => assert(gotTop5.contains(p), s"exact top-1 $p lost"))
  }

  test("binary sig: words are 32-bit, bit d tracks sign of dim d") {
    val sigs = Quantize.binaryEncode(e, "vec_id", "embedding", K.Dim)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val raw = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(sigs.values.forall(ws => ws.length == (K.Dim + 31) / 32 &&
      ws.forall(w => w >= 0L && w < (1L << 32))))
    raw.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, d) =>
        val bit = (sigs(id)(d / 32) >> (d % 32)) & 1L
        assert(bit == (if (x > 0f) 1L else 0L), s"vec $id dim $d")
      }
    }
  }

  test("hamming top-k: self-distance 0 ranks first; rescore restores exact top-1") {
    val qdf = e.filter(col("vec_id") < 4)
    val qSigs = Quantize.binaryEncode(
      qdf.select(col("vec_id").as("qid"), col("embedding")), "qid", "embedding", K.Dim)
    val cSigs = Quantize.binaryEncode(e, "vec_id", "embedding", K.Dim)
    val ham = Quantize.hammingTopK(qSigs, "qid", cSigs, "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    ham.filter(_._3 == 1).foreach { case (qid, top1, _, h) =>
      assert(top1 == qid && h == 0L, s"query $qid: top1=$top1 hamming=$h")
    }
    val q = qdf.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val rescored = Quantize.binarySearchRescored(
      q, "qid", "qv", e, "vec_id", "embedding", K.Dim, 32, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val exact = Similarity.knnJoin(q, "qid", "qv", e, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val top1 = rescored.filter(_._3 == 1).map(r => (r._1, r._2)).toSet
    assert(top1 == exact, s"rescored top-1 $top1 != exact $exact")
  }

  test("matryoshka: unit norm, proportional to the raw prefix, search sane") {
    val m = e.select(col("vec_id"),
        Quantize.matryoshka(col("embedding"), 16).as("m"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Float](2)))
    m.foreach { case (id, tv, raw) =>
      assert(tv.length == 16)
      val n = math.sqrt(tv.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"vec $id truncated norm $n")
      // direction preserved: truncated vec ∝ first-16 raw prefix
      val rawN = math.sqrt(raw.take(16).map(x => x.toDouble * x).sum)
      tv.zip(raw.take(16)).foreach { case (t, r0) =>
        assert(math.abs(t * rawN - r0.toDouble) < 1e-6)
      }
    }
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Quantize.matryoshkaSearchRescored(q, "qid", "qv", e, "vec_id",
      "embedding", 16, 16, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 6)
    got.filter(_._3 == 1).foreach { case (qid, top1, _) =>
      assert(top1 == qid, s"query $qid truncated-then-rescored top-1 was $top1")
    }
  }

  test("plan shapes: narrow encodes, partial top-k ranking, no Window") {
    val codesPlan = Quantize.sqEncode(e, "vec_id", "embedding", stats)
      .queryExecution.executedPlan.toString
    // the only exchange feeds the broadcast stats row, never the corpus
    assert(!codesPlan.contains("Exchange hashpartitioning"),
      s"sq encode must not shuffle the corpus:\n$codesPlan")
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val searchPlan = Quantize.binarySearchRescored(
      q, "qid", "qv", e, "vec_id", "embedding", K.Dim, 32, 5)
      .queryExecution.executedPlan.toString
    assert(!searchPlan.contains("Window"), s"no window ranking:\n$searchPlan")
    assert(searchPlan.contains("partial_topkagg"),
      s"expected map-side partial top-k:\n$searchPlan")
  }
}

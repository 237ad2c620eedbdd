package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{EmbTableBank, TransformerBackend}
import graft.model.Safetensors

/** The learned embed_tokens table and its in-vocab/fallback contract. */
class EmbTableBankSpec extends AnyFunSuite {

  test("table loads from model.safetensors under the candle tensor name") {
    assert(Safetensors.resolveWeightFiles(EmbTableBank.files.keySet) ==
      Seq("model.safetensors"))
    val wq = EmbTableBank.loadedQuantized
    assert(wq.length == EmbTableBank.VocabSize * EmbTableBank.Dim)
    assert(wq == (0 until wq.length).map(EmbTableBank.weightK))
    assert(EmbTableBank.bank.exists(f => f != math.floor(f)))
  }

  test("in-vocab ids use the table: forward differs from the hash backend") {
    val inVocab = Array(1L, 5L, 9L, 2L) // WordPiece-range ids
    val hash = TransformerBackend(dim = 8)
    val learned = TransformerBackend(dim = 8,
      embTable = Some(EmbTableBank.loadedQuantized))
    assert(hash.embedBatch(Seq(inVocab)).head.toSeq !=
      learned.embedBatch(Seq(inVocab)).head.toSeq)
  }

  test("out-of-table ids fall back to the hash stream exactly") {
    // every id >= vocabSize → the learned backend IS the hash backend
    val outOfVocab = Array(1000L, 99999L, 12345L)
    val hash = TransformerBackend(dim = 8)
    val learned = TransformerBackend(dim = 8,
      embTable = Some(EmbTableBank.loadedQuantized))
    assert(hash.embedBatch(Seq(outOfVocab)).head.toSeq ==
      learned.embedBatch(Seq(outOfVocab)).head.toSeq)
  }

  test("table cells land in [0, M3) (the attention overflow bound)") {
    val wq = EmbTableBank.loadedQuantized
    wq.foreach { k =>
      val cell = (k % graft.functions.K.M3 + graft.functions.K.M3) % graft.functions.K.M3
      assert(cell >= 0 && cell < graft.functions.K.M3)
    }
  }

  test("a wrong-sized table is rejected at construction") {
    intercept[IllegalArgumentException] {
      TransformerBackend(dim = 8, embTable = Some(IndexedSeq(1L)))
    }
  }
}

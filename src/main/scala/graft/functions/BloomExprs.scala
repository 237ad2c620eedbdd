package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Handle to a Bloom-filter bitset (an Array[Long] of nBits/64 words plus
  * the k hash-row count). Same inline/broadcast split as [[CentroidBank]]:
  * a small filter rides the plan, a large one ships once per executor via
  * torrent broadcast instead of per-task serialization. */
sealed trait BloomBank extends Serializable {
  def words: Array[Long]
  def nBits: Int
  def k: Int

  /** Bit test at position pos (0 <= pos < nBits). */
  final def test(pos: Long): Boolean =
    (words((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L
}

final case class InlineBloom(words: Array[Long], nBits: Int, k: Int)
    extends BloomBank

final class BroadcastBloom(val handle: Broadcast[(Array[Long], Int, Int)])
    extends BloomBank {
  @transient private lazy val v = handle.value
  override def words: Array[Long] = v._1
  override def nBits: Int = v._2
  override def k: Int = v._3
}

object BloomBank {
  /** Words above which the bitset broadcasts instead of inlining. */
  private val InlineMaxWords = 512

  /** Builds the bitset from set bit positions. */
  def of(spark: SparkSession, positions: Array[Long], nBits: Int,
         k: Int): BloomBank = {
    require(nBits % 64 == 0, s"nBits must be a multiple of 64, got $nBits")
    val words = new Array[Long](nBits / 64)
    positions.foreach { p =>
      require(p >= 0 && p < nBits, s"position $p outside [0, $nBits)")
      words((p >>> 6).toInt) |= 1L << (p & 63L)
    }
    if (words.length <= InlineMaxWords) InlineBloom(words, nBits, k)
    else new BroadcastBloom(spark.sparkContext.broadcast((words, nBits, k)))
  }
}

/** Count of DISTINCT shingles in the input array whose k Bloom positions
  * ([[graft.operators.Sketch.bloomPositions]] arithmetic: pos_i =
  * ((s*a_i + b_i) mod P32) mod nBits over the minhashPerm rows) are all
  * set in the bank's bitset. One tight JVM loop per row — the narrow
  * probe of a broadcast Bloom filter, the decontamination hot path that
  * replaces the corpus-vs-eval shingle join at 100 TB. */
case class BloomFlagged(child: Expression, bank: BloomBank)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // hash-row constants resolved once per expression instance
  private lazy val as: Array[Long] = Array.tabulate(bank.k)(Dedup.minhashPerm(_)._1)
  private lazy val bs: Array[Long] = Array.tabulate(bank.k)(Dedup.minhashPerm(_)._2)

  override def nullSafeEval(input: Any): Any =
    evalArr(input.asInstanceOf[ArrayData])

  def evalArr(v: ArrayData): Long = {
    val n = v.numElements()
    val nBits = bank.nBits
    val kk = bank.k
    val seen = new java.util.HashSet[Long](math.max(16, n * 2))
    var flagged = 0L
    var i = 0
    while (i < n) {
      val s = v.getLong(i)
      if (seen.add(s)) {
        var all = true
        var j = 0
        while (j < kk && all) {
          val pos = ((s * as(j) + bs(j)) % K.P32) % nBits
          all = bank.test(pos)
          j += 1
        }
        if (all) flagged += 1L
      }
      i += 1
    }
    flagged
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFlagged", this, classOf[BloomFlagged].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalArr($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomFlagged =
    copy(child = newChild)
}

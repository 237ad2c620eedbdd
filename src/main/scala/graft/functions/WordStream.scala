package graft.functions

/** THE normalizer word stream — the per-char classification state
  * machine every tokenizer family shares (lowercase landing in
  * [a-z0-9] joins the current word, everything else separates; U+0130
  * contributes 'i' then separates, because its string lowercase is
  * "i" + combining dot). One definition instead of a hand-maintained
  * invariant across the vocab tokenizers: [[WordPieceIds]],
  * [[BpeIds]], and [[UnigramIds]] all call this, so their word
  * streams are equal by construction (and equal to the hashing
  * [[TokenIdsKernel]]'s, whose fused per-char loop mirrors the same
  * classification — pinned by the cross-family specs). */
object WordStream {

  /** Invoke `f` once per normalized word of `s`, in order. */
  def foreachWord(s: String, f: String => Unit): Unit = {
    val n = s.length
    val word = new java.lang.StringBuilder
    def flush(): Unit =
      if (word.length > 0) { f(word.toString); word.setLength(0) }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val lc: Int =
        if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') c.toInt
        else if (c >= 'A' && c <= 'Z') c.toInt + 32
        else if (c < 128) -1
        else if (c == 'İ') -2
        else {
          val l = Character.toLowerCase(c)
          if (l >= 'a' && l <= 'z' || l >= '0' && l <= '9') l.toInt else -1
        }
      if (lc >= 0) word.append(lc.toChar)
      else if (lc == -2) { word.append('i'); flush() }
      else flush()
      i += 1
    }
    flush()
  }
}

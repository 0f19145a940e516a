package graft

import org.apache.spark.sql.functions._
import graft.ml.TextOps

/** The committed BPE contract (round 15): the judged replace-chain
  * tokenizer must equal the classic per-symbol merge scan (Sennrich et
  * al. 2016, arXiv:1508.07909 — the apply side) on every input,
  * including the boundary inputs naive chain encodings get wrong, and
  * the committed per-word counts of the fixture vocabulary are pinned.
  */
class TextOpsBpeSpec extends SparkSpec {

  /** Reference implementation: the classic BPE apply — scan the symbol
    * list, merging every (a, b) occurrence left-to-right, one merge rule
    * at a time in table order.
    */
  private def classicScan(word: String): Seq[String] = {
    var sym: List[String] = word.map(_.toString).toList
    TextOps.BpeMerges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < sym.length) {
        if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
          out += a + b; i += 2
        } else { out += sym(i); i += 1 }
      }
      sym = out.toList
    }
    sym
  }

  private def sparkCounts(words: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    words.toDF("text")
      .select(col("text"), expr(TextOps.bpeTokenCountExpr("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("replace-chain equals the classic merge scan, incl. boundary words") {
    // fixture vocabulary plus adversarial inputs:
    //  - "fast": after ('s','t') forms "st", a single-space chain's
    //    ' a s' pattern would eat the st-prefix (3 mis-counted as 2)
    //  - "stst"/"sss"/"ererer": consecutive same-pair merges — a
    //    single SHARED separator space makes non-overlapping replace
    //    skip every second occurrence (2 mis-counted as 3)
    val words = Seq("join", "hash", "customer", "table", "the", "fast",
      "group", "stream", "a", "dup", "x", "aaas", "sss", "ererer",
      "stst", "ststst", "partpart", "joinjoin", "atat", "cucu")
    val got = sparkCounts(words)
    words.foreach { w =>
      assert(got(w) === classicScan(w).length.toLong,
        s"'$w': chain ${got(w)} != classic ${classicScan(w).mkString("|")}")
    }
    assert(got("fast") === 3L, "the symbol-boundary guard must hold")
    assert(got("stst") === 2L, "the doubled-separator guard must hold")
  }

  test("committed fixture counts: fully-merged words and multi-token words") {
    val got = sparkCounts(Seq("join", "hash", "customer", "column", "batch",
      "scan", "row", "a", "table", "group", "stream", "small", "query"))
    // fully merged to one token by the committed table
    Seq("join", "hash", "customer", "column", "batch", "scan", "row", "a")
      .foreach(w => assert(got(w) === 1L, s"'$w' should be one token"))
    // genuinely multi-token under 32 merges
    assert(got("table") === 5L && got("group") === 5L
      && got("stream") === 5L && got("small") === 5L && got("query") === 4L)
  }

  test("doc-level count is the sum of per-word counts") {
    import spark.implicits._
    val n = Seq("join hash fast table").toDF("text")
      .select(expr(TextOps.bpeTokenCountExpr("text")).as("n"))
      .head().getLong(0)
    assert(n === 1L + 1L + 3L + 5L)
  }
}

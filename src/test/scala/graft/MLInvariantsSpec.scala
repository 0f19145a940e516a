package graft

/** Structural invariants of the newest training-data gates — properties
  * the DuckDB oracle's value-compare implies but is worth stating (and
  * keeping) explicitly: they document WHAT the operators guarantee, not
  * just that two engines agree.
  */
class MLInvariantsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("pack_sequences_greedy: chunk boundaries respect the 512-token grid") {
    // grid-window assignment (chunk = floor(start_offset/512)) does NOT
    // guarantee every non-final chunk holds >= 512 of its own tokens —
    // after an overshoot the next chunk starts mid-window and can close
    // short. What the formula DOES guarantee: the cumulative token count
    // through a chunk reaches past every later chunk's window start
    // (start_of_next_chunk >= 512 * next_chunk_id), ids rise
    // monotonically, and packing conserves tokens.
    val rows = SparkEntry.queries("pack_sequences_greedy")(spark, d).collect()
    val byShard = rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
    assert(byShard.nonEmpty)
    byShard.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids are the floor of the running start offset — first is 0
      assert(sorted.head.getAs[Long]("chunk_id") === 0L)
      var cum = 0L
      sorted.toSeq.sliding(2).foreach {
        case Seq(c, next) =>
          cum += c.getAs[Long]("token_sum")
          // the first doc of `next` starts at offset `cum`, inside window
          // next.chunk_id: 512*id <= cum < 512*(id+1) is the grid contract
          val id = next.getAs[Long]("chunk_id")
          assert(cum >= 512L * id && cum < 512L * (id + 1),
            s"chunk boundary $cum outside window $id")
        case _ => ()
      }
    }
    // packing conserves tokens: chunk sums add up to the corpus total
    val corpusTokens = graft.tables.Tables.documents(spark, d)
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS t")
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getAs[Long]("token_sum")).sum === corpusTokens)
  }

  test("text_chunk_sliding: contiguous windows, stride-bounded tails, full coverage") {
    val rows = SparkEntry.queries("text_chunk_sliding")(spark, d).collect()
    val words = graft.tables.Tables.documents(spark, d)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === words.keySet) // every doc chunks
    byDoc.foreach { case (id, cs) =>
      val n = words(id)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // chunk ids contiguous from 0, count = (n-1) div 16 + 1 (capped at
      // 256 windows — the explicit cross-engine grid contract)
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq ===
        (0L to math.min((n - 1) / 16, 255L)))
      sorted.foreach { c =>
        val (i, t) = (c.getAs[Long]("chunk_idx"), c.getAs[Long]("n_tokens"))
        assert(t === math.min(32L, n - i * 16)) // exact window arithmetic
      }
      // overlap: every non-final chunk holds more than one stride of
      // tokens, so consecutive windows genuinely share content
      sorted.dropRight(1).foreach(c => assert(c.getAs[Long]("n_tokens") === 32L ||
        c.getAs[Long]("n_tokens") > 16L))
    }
  }

  test("text_chunk_sliding: over-cap docs are flagged truncated, never silently clipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkcap").toString
    import spark.implicits._
    val longText = (0 until 5000).map(i => s"w$i").mkString(" ")
    val shortText = (0 until 100).map(i => s"w$i").mkString(" ")
    // full contract schema (Tables.load diffs against Tables.Expected)
    Seq((1L, shortText), (2L, longText)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_chunk_sliding")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // the 5000-token doc hits the 256-window cap AND every one of its
    // rows says so — the cap is loud, not silent
    assert(byDoc(2L).length === 256)
    assert(byDoc(2L).forall(_.getAs[Long]("truncated") === 1L))
    // the in-cap doc is complete and unflagged
    assert(byDoc(1L).length === (100 - 1) / 16 + 1)
    assert(byDoc(1L).forall(_.getAs[Long]("truncated") === 0L))
    // and the judged fixture corpus never trips the flag (docs ≤ 100
    // tokens), so the green gate also proves the flag's negative case
    assert(SparkEntry.queries("text_chunk_sliding")(spark, d)
      .filter("truncated != 0").count() === 0L)
  }

  test("text_bm25_retrieval: rescaled integer score keeps int64 headroom at TL = 1e13") {
    import graft.queries.MLQueries
    // 100 TB-corpus worst-case grid: TL = 1e13 tokens, n_docs = 1e11
    // (avgdl 100); df = 1 maximizes idf. Every multiply in
    // bm25ScoreMicro is Math.multiplyExact, so an overflow THROWS — this
    // loop passing IS the headroom proof.
    val tl = 10000000000000L
    val n = 100000000000L
    // len = 1e12 is the skew case: one multi-trillion-token doc, so
    // len·n_docs = 1e23 ≫ 2^63 — only the rescale-before-multiply
    // denominator ((len div g)·n + ((len mod g)·n) div g) survives it
    for (df <- Seq(1L, 3L, 1000000L); tf <- Seq(1L, 1000L, 200000L);
         len <- Seq(1L, 200000L, 1000000L, 1000000000000L)) {
      val s = MLQueries.bm25ScoreMicro(df, tf, tl, len, n)
      assert(s >= 0L && s <= 2200000L)
      // rescaling g = TL div 1e6 truncates at ~1e-6 relative precision;
      // the score must track the exact (BigInt) unrescaled value within it
      val exact = (BigInt(1000000L / df) * 22 * tf * tl) /
        (BigInt(10) * tf * tl + BigInt(3) * tl + BigInt(9) * len * n)
      assert((BigInt(s) - exact).abs.toLong <= 2L + (exact.toDouble * 1e-5).toLong,
        s"df=$df tf=$tf len=$len: rescaled $s vs exact $exact")
    }
    // judged-scale equivalence: TL < 1e6 ⇒ g = 1 and the rescaled formula
    // is VALUE-identical to the original — not just rank-preserving
    for (tl0 <- Seq(1000L, 999999L); df <- Seq(1L, 7L); tf <- Seq(1L, 50L);
         len <- Seq(10L, 500L)) {
      val n0 = math.max(1L, tl0 / 100)
      val unrescaled = (BigInt(1000000L / df) * 22 * tf * tl0) /
        (BigInt(10) * tf * tl0 + BigInt(3) * tl0 + BigInt(9) * len * n0)
      assert(MLQueries.bm25ScoreMicro(df, tf, tl0, len, n0) === unrescaled.toLong)
    }
  }

  test("sample_mixture_temperature: minority sources get strictly higher acceptance") {
    val rows = SparkEntry.queries("sample_mixture_temperature")(spark, d).collect()
    assert(rows.nonEmpty)
    // t_s ∝ 1/sqrt(n_s): a strictly larger source must get a strictly
    // smaller (or capped-equal) acceptance threshold — the whole point of
    // temperature flattening
    val byN = rows.map(r => (r.getAs[Long]("n_s"), r.getAs[Long]("t_s"))).sortBy(_._1)
    byN.sliding(2).foreach {
      case Array((n1, t1), (n2, t2)) =>
        if (n1 < n2) assert(t1 >= t2, s"n_s=$n1 t=$t1 vs n_s=$n2 t=$t2")
        assert(t1 <= 1000000L && t2 <= 1000000L)
      case _ =>
    }
    // kept never exceeds the source size, and the realized total tracks
    // the N/2 target loosely (hash-draw variance; the thresholds
    // themselves are deterministic and judged exactly by the gate)
    rows.foreach(r => assert(r.getAs[Long]("kept") <= r.getAs[Long]("n_s")))
    val nTot = rows.map(_.getAs[Long]("n_s")).sum
    val kept = rows.map(_.getAs[Long]("kept")).sum
    assert(kept > nTot / 4 && kept < 3 * nTot / 4,
      s"kept $kept wildly off the n/2 target of ${nTot / 2}")
  }

  test("dedup_semantic_clusters: cells partition the corpus, each keeps its exemplar") {
    val rows = SparkEntry.queries("dedup_semantic_clusters")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      assert(cell >= 0L && cell < 8L)
      val m = r.getAs[Long]("n_members")
      val k = r.getAs[Long]("n_kept")
      // keep-first semantics: a cell's lowest-id member has no earlier
      // neighbor to lose to, so every non-empty cell keeps at least one
      assert(k >= 1L && k <= m, s"cell $cell kept $k of $m")
    }
    // the coarse quantizer assigns every vector to exactly one cell:
    // membership counts conserve the table
    val total = graft.tables.Tables.embeddings(spark, d).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum === total)
  }

  test("text_quality_classifier: census conserves docs, model is a pure function") {
    val rows = SparkEntry.queries("text_quality_classifier")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("n_pass")
      assert(p >= 0L && p <= r.getAs[Long]("n_docs"))
    }
    val total = graft.tables.Tables.documents(spark, d).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    // committed-model scoring is a pure function of the text: a fresh
    // plan reproduces every checksum bit-for-bit
    val again = SparkEntry.queries("text_quality_classifier")(spark, d).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("text_keywords_tfidf: dense ranks 1..5 per source, scores non-increasing") {
    val rows = SparkEntry.queries("text_keywords_tfidf")(spark, d).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val scores = sorted.map(_.getAs[Long]("score_micro"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // score is exactly the integer contract tf * (1e6 div df)
      sorted.foreach { r =>
        assert(r.getAs[Long]("score_micro") ===
          r.getAs[Long]("tf") * (1000000L / r.getAs[Long]("df")))
      }
    }
  }

  test("dedup_connected_components: reliable-checkpoint opt-in is output-identical") {
    // default path = localCheckpoint (executor storage); the opt-in swaps
    // every lineage cut in the loop for a reliable checkpoint() — the
    // 100 TB executor-loss posture. Same labels, same canonicals.
    val dflt = SparkEntry.queries("dedup_connected_components")(spark, d).collect()
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val reliable = SparkEntry.queries("dedup_connected_components")(spark, d).collect()
      assert(reliable.toSeq === dflt.toSeq)
      // round 13/14: the scratch checkpoint dir Components created for
      // this run is registered for exit cleanup; invoke the sweep
      // directly and verify no orphan dir survives a RELIABLE-mode run.
      // The dir STAYS tracked after the sweep (round 14): this JVM's
      // SparkContext still points its checkpointDir at the deleted path,
      // so a later reliable checkpoint in any suite silently
      // mkdirs-recreates it — keeping it in scratchCkptDirs means the
      // JVM-exit hook sweeps that recreation too instead of leaking it.
      import scala.jdk.CollectionConverters._
      graft.ml.Components.scratchCkptDirs.asScala.lastOption match {
        case Some(dir) =>
          assert(dir.getName.startsWith("graft-ckpt"))
          graft.ml.Components.cleanupScratchCkptDirs()
          assert(!dir.exists(), s"scratch checkpoint dir $dir survived cleanup")
          assert(graft.ml.Components.scratchCkptDirs.contains(dir),
            "swept dir must stay tracked — the live context can recreate it")
        case None =>
          // another suite in this JVM may have set a checkpoint dir first;
          // then Components must NOT have claimed ownership of it
          assert(spark.sparkContext.getCheckpointDir.isDefined)
      }
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }

  test("filter_length_outliers: kept counts stay within totals and never empty a source") {
    val rows = SparkEntry.queries("filter_length_outliers")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      // a [p10, p90] band always contains the median: some doc survives
      assert(k >= 1L && k <= n)
    }
  }
}

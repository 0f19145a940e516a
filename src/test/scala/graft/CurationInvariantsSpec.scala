package graft

import org.apache.spark.sql.functions._

/** Structural invariants + plan-shape pins of the round-14 curation gates
  * (CurationQueries) — the properties the DuckDB oracle's value-compare
  * implies but is worth stating explicitly, plus the `.explain` promises
  * SCALE.md makes for each operator.
  */
class CurationInvariantsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("dedup_substring_spans: spans cover >= k tokens, never exceed the doc") {
    val rows = SparkEntry.queries("dedup_substring_spans")(spark, d).collect()
    assert(rows.nonEmpty, "sf0.001 corpus should carry duplicated 8-grams")
    rows.foreach { r =>
      val nSpans = r.getAs[Long]("n_spans")
      val dupTok = r.getAs[Long]("dup_tokens")
      val nTok = r.getAs[Long]("n_tokens")
      val frac = r.getAs[Double]("dup_frac")
      assert(nSpans >= 1L)
      // every maximal span holds at least one full 8-gram, and merged
      // spans cannot cover more tokens than the document has
      assert(dupTok >= 8L * nSpans && dupTok <= nTok,
        s"doc ${r.getAs[Long]("doc_id")}: dup=$dupTok spans=$nSpans n=$nTok")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // duplication is symmetric at the gram level: a doc can only carry a
    // duplicated gram if at least one OTHER doc carries it too
    assert(rows.length >= 2, "a duplicated span needs two carriers")
  }

  test("text_distribution_drift: probabilities normalize, kl terms nonnegative") {
    val rows = SparkEntry.queries("text_distribution_drift")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      val (pa, pb) = (r.getAs[Double]("p_a"), r.getAs[Double]("p_b"))
      assert(pa > 0.0 && pa < 1.0 && pb > 0.0 && pb < 1.0)
      // (p_a - p_b) and ln(p_a / p_b) always share sign, so every
      // symmetric-KL contribution is nonnegative (up to the r6 floor,
      // which can round a ~0 term to exactly 0 but never below -1e-6)
      assert(r.getAs[Double]("kl_term") >= -1e-6,
        s"word ${r.getAs[String]("word")}: negative kl term")
      assert(r.getAs[Long]("cnt_a") + r.getAs[Long]("cnt_b") >= 1L)
    }
  }

  test("similarity_hard_negatives: labels match the kind, no self-pairs, no window sort") {
    val labels = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("similarity_hard_negatives")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(n != q, "self-pair mined")
      val sim = r.getAs[Double]("sim")
      assert(sim >= -1.000001 && sim <= 1.000001)
      r.getAs[String]("kind") match {
        case "pos" => assert(labels(n) == labels(q), s"pos pair across labels: $q->$n")
        case "neg" => assert(labels(n) != labels(q), s"neg pair within label: $q->$n")
        case k => fail(s"unknown kind $k")
      }
    }
    // at most one pos and one neg per query
    rows.groupBy(r => (r.getAs[Long]("query_id"), r.getAs[String]("kind")))
      .foreach { case (k, g) => assert(g.length == 1, s"duplicate winner for $k") }
    // SCALE.md promise: the winner comes from a partial max-aggregate over
    // the broadcast nested-loop candidate stream, never a window sort of
    // the full cross product
    val p = plan("similarity_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), "query side must broadcast")
    assert(!p.contains("Window"), "hard-negative mining must not window-sort")
  }

  test("embedding_pca_power: unit-norm loading, pinned sign, one eigenvalue") {
    val rows = SparkEntry.queries("embedding_pca_power")(spark, d).collect()
    assert(rows.length == 64)
    val loads = rows.sortBy(_.getAs[Long]("i")).map(_.getAs[Double]("loading"))
    // each component re-pins to the 1e-6 grid after the final normalize,
    // so the norm can drift from 1 by at most ~64 half-ulps of that grid
    val norm = math.sqrt(loads.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading norm $norm")
    assert(loads.head >= 0.0, "sign pin: first component must be nonnegative")
    val eigs = rows.map(_.getAs[Double]("eigval")).distinct
    assert(eigs.length == 1 && eigs.head > 0.0, s"eigval column: ${eigs.toSeq}")
  }

  test("embedding_norm_outliers: outliers bounded, sd nonnegative") {
    val rows = SparkEntry.queries("embedding_norm_outliers")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))
      assert(out >= 0L && out <= n)
      assert(r.getAs[Double]("sd_norm") >= 0.0)
      assert(r.getAs[Double]("mean_norm") > 0.0)
      // Chebyshev: at most 1/4 of any distribution sits past 2 sigma
      assert(4L * out <= n + 3L, s"label ${r.getAs[Long]("label")}: $out of $n past 2 sigma")
    }
  }

  test("dataset_split_temporal: splits partition events, leaks bounded by sides") {
    val rows = SparkEntry.queries("dataset_split_temporal")(spark, d).collect()
      .map(r => r.getAs[String]("part") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    for (p <- Seq("train", "val", "test"))
      assert(rows.contains(p) && rows(p)._1 > 0L, s"split $p missing or empty")
    // temporal split partitions the table exactly
    val total = spark.read.parquet(s"$d/events.parquet").count()
    assert(rows("train")._1 + rows("val")._1 + rows("test")._1 == total)
    // every leak row's overlap is bounded by the smaller side's users
    for ((a, b) <- Seq(("test", "train"), ("test", "val"), ("train", "val"))) {
      rows.get(s"leak_${a}_$b").foreach { case (ne, nu) =>
        assert(ne == 0L)
        assert(nu <= math.min(rows(a)._2, rows(b)._2))
      }
    }
  }

  test("sample_coreset_kcenter: radii non-increasing, centers distinct, seed pinned") {
    val rows = SparkEntry.queries("sample_coreset_kcenter")(spark, d).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 8)
    assert(rows.head.getAs[Long]("center_id") == 0L
      && rows.head.getAs[Double]("radius") == 0.0)
    val ids = rows.map(_.getAs[Long]("center_id"))
    assert(ids.distinct.length == ids.length, "a center was picked twice")
    // greedy farthest-point radii can never increase round over round
    val radii = rows.drop(1).map(_.getAs[Double]("radius"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-6, s"radius rose: $a -> $b")
    }
  }

  test("sample_mixture_weights: weights normalize and follow sqrt-size ordering") {
    val rows = SparkEntry.queries("sample_mixture_weights")(spark, d).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    // each weight is r6-floored so the sum undershoots 1 by < 20e-6
    assert(wsum > 1.0 - 2e-5 && wsum <= 1.0 + 2e-5, s"weights sum to $wsum")
    rows.foreach { r =>
      assert(r.getAs[Double]("weight") > 0.0)
      assert(r.getAs[Double]("avg_q") > 0.0 && r.getAs[Double]("avg_q") <= 1.0)
      assert(r.getAs[Long]("docs_per_1000") >= 0L)
    }
  }

  test("similarity_range_search: every pair clears the threshold, shares a bucket plan") {
    val rows = SparkEntry.queries("similarity_range_search")(spark, d).collect()
    assert(rows.nonEmpty, "0.4 threshold should match planted same-bucket pairs")
    rows.foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.4)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
    // the range probe must ride the LSH bucket join, never a cross product
    val p = plan("similarity_range_search")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range search fell back to an all-pairs product")
  }

  test("text_gopher_rules: keep is the AND of flags, both keep classes present") {
    val rows = SparkEntry.queries("text_gopher_rules")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getAs[Boolean]("flag_word_count") &&
        r.getAs[Boolean]("flag_mean_word_len") &&
        r.getAs[Boolean]("flag_stopwords") && r.getAs[Boolean]("flag_alpha")
      assert(r.getAs[Boolean]("keep") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: keep is not the AND of its flags")
    }
    // the 10-99-word corpus must fail the [50, 1e5] band for some docs
    // and pass it for others — the rule genuinely binds
    assert(rows.exists(_.getAs[Boolean]("flag_word_count")))
    assert(rows.exists(!_.getAs[Boolean]("flag_word_count")))
  }

  test("similarity_containment: containment = max direction, bounds, >= jaccard") {
    val cont = SparkEntry.queries("similarity_containment")(spark, d).collect()
    assert(cont.nonEmpty)
    cont.foreach { r =>
      val ab = r.getAs[Double]("cont_a_in_b")
      val ba = r.getAs[Double]("cont_b_in_a")
      val c = r.getAs[Double]("containment")
      assert(ab > 0.0 && ab <= 1.0 && ba > 0.0 && ba <= 1.0)
      // shared/min(na,nb) is exactly the larger directional ratio (allow
      // 1e-6 for the independent r6 roundings of the three ratios)
      assert(math.abs(c - math.max(ab, ba)) <= 1e-6, s"$c vs max($ab,$ba)")
    }
    // same pair, same df-capped shingle universe: containment dominates
    // Jaccard (denominator min(|A|,|B|) <= |A∪B|)
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val joined = cont.flatMap { r =>
      jac.get((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .map(j => (r.getAs[Double]("containment"), j))
    }
    assert(joined.nonEmpty, "top-10 lists share at least one pair")
    joined.foreach { case (c, j) => assert(c >= j - 1e-6, s"$c < $j") }
  }

  test("embedding_random_projection: plan is a shuffle-free codegen map; " +
    "values match a driver-side recomputation") {
    val p = plan("embedding_random_projection")
    assert(p.contains("float_vec_dot"), "projection must use the codegen kernel")
    // narrow map: the ONLY exchange is the judged output's rangepartition sort
    assert(!p.contains("Exchange hashpartitioning"), p.linesIterator.take(6).mkString("\n"))
    // sign matrix is balanced enough to be a credible JL sketch
    val ones = graft.queries.CurationQueries.projSigns.map(_.count(_ > 0f)).sum
    assert(ones > 400 && ones < 624, s"sign matrix degenerate: $ones of 1024 positive")

    val rows = SparkEntry.queries("embedding_random_projection")(spark, d)
      .limit(3).collect()
    val raw = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val emb = raw(r.getAs[Long]("vec_id"))
      (0 until 16).foreach { j =>
        val signs = graft.queries.CurationQueries.projSigns(j)
        var acc = 0.0
        emb.indices.foreach(i => acc += emb(i).toDouble * signs(i).toDouble)
        val expect = math.floor(acc / 4.0 * 1e6 + 0.5) / 1e6
        assert(r.getAs[Double](s"p$j") === expect)
      }
    }
  }

  test("similarity_pq_encode: narrow-map plan, codes in range, errors non-negative") {
    val p = plan("similarity_pq_encode")
    assert(p.contains("float_vec_dot"))
    // encode is a pure narrow map — only the judged output's range sort
    assert(!p.contains("Exchange hashpartitioning"))
    val rows = SparkEntry.queries("similarity_pq_encode")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until 4).foreach { sub =>
        val c = r.getAs[Long](s"c$sub")
        assert(c >= 0L && c < 8L, s"code $c out of codebook range")
      }
      assert(r.getAs[Long]("err_micro") >= 0L)
    }
    // a seed vector IS its own nearest codeword in every subspace, with
    // zero residual: the encode must be exact on the codebook
    val seeds = rows.filter(_.getAs[Long]("vec_id") < 8L)
    assert(seeds.length === math.min(8, rows.length))
    seeds.foreach { r =>
      (0 until 4).foreach(sub =>
        assert(r.getAs[Long](s"c$sub") === r.getAs[Long]("vec_id")))
      assert(r.getAs[Long]("err_micro") === 0L)
    }
  }

  test("similarity_pq_adc_topk: dense ranks, monotone distances, db-only neighbors") {
    val rows = SparkEntry.queries("similarity_pq_adc_topk")(spark, d).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 5)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to 5L),
        s"query $q ranks not dense")
      val dists = sorted.map(_.getAs[Long]("approx_micro")).toSeq
      assert(dists === dists.sorted, s"query $q distances not monotone")
      sorted.foreach(r => assert(r.getAs[Long]("neighbor_id") >= 5L,
        "queries must never rank themselves or other query vectors"))
    }
  }

  test("events_retention_weekly: week-0 is the full cohort, actives never exceed it") {
    val p = plan("events_retention_weekly")
    // first-event window, distinct, and rollup all ride one user shuffle
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size === 1, p)
    val rows = SparkEntry.queries("events_retention_weekly")(spark, d).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (ck, rs) =>
      val zero = rs.filter(_.getAs[Long]("week_offset") == 0L)
      assert(zero.length === 1, s"cohort $ck missing its week-0 row")
      assert(zero.head.getAs[Double]("retention") === 1.0)
      rs.foreach { r =>
        assert(r.getAs[Long]("week_offset") >= 0L)
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
        assert(r.getAs[Long]("cohort_size") === zero.head.getAs[Long]("n_active"))
      }
    }
  }

  test("text_bigram_surprise: strictly positive scores, ranked descending") {
    // top-20 must plan as TakeOrdered, never a global sort of all docs
    assert(plan("text_bigram_surprise").contains("TakeOrderedAndProject(limit=20"))
    val rows = SparkEntry.queries("text_bigram_surprise")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // −ln p(w2|w1) under add-one smoothing: (c1+V)/(cb+1) > 1 always
      // (cb <= c1 and V >= 1), so surprise is strictly positive
      assert(r.getAs[Double]("avg_surprise") > 0.0)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
    val scores = rows.map(_.getAs[Double]("avg_surprise")).toSeq
    assert(scores === scores.sorted.reverse, "top-20 not ranked by surprise")
  }

  test("multimodal_audio_features: channel layout, energy and ZC bounds") {
    val rows = SparkEntry.queries("multimodal_audio_features")(spark, d).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      // the synthesis contract: 1 + id % 2 channels, 100 + id % 400 frames
      assert(rs.length === (1 + id % 2).toInt, s"doc $id channel count")
      rs.foreach { r =>
        val nf = r.getAs[Long]("n_frames")
        assert(nf === 100 + id % 400)
        // a crossing needs two consecutive frames; energy is bounded by
        // the PCM16 sample range
        assert(r.getAs[Long]("zero_crossings") <= nf - 1)
        assert(r.getAs[Long]("sum_sq") <= nf * 32768L * 32768L)
      }
    }
  }

  test("similarity_pq_recall: 5 queries, recall a fraction of exactly 5 hits") {
    val rows = SparkEntry.queries("similarity_pq_recall")(spark, d).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq === (0L to 4L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L)
      assert(r.getAs[Double]("recall") === hits.toDouble / 5.0)
    }
  }

  test("multimodal_thumbnail_grid: 2x2 cells partition every image exactly") {
    val rows = SparkEntry.queries("multimodal_thumbnail_grid")(spark, d).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      assert(rs.length === 4, s"doc $id must have 2x2 cells")
      // the cells partition the raster: pixel counts add to w*h of the
      // synthesis contract, and channel sums stay within 8-bit range
      val w = 4 + id % 13
      val h = 3 + id % 7
      assert(rs.map(_.getAs[Long]("n_px")).sum === w * h)
      rs.foreach { r =>
        val n = r.getAs[Long]("n_px")
        assert(n >= 1L, "a 2x2 grid over w>=4,h>=3 leaves no empty cell")
        Seq("r_sum", "g_sum", "b_sum").foreach(c =>
          assert(r.getAs[Long](c) <= 255L * n))
      }
    }
  }

  test("similarity_ann_ivfpq: dense ranks, db-only, agrees with full ADC scan") {
    val rows = SparkEntry.queries("similarity_ann_ivfpq")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to sorted.length).toSeq, s"query $q ranks must be dense from 1")
      assert(sorted.length <= 5)
      // approx distance is non-decreasing along the ranking
      sorted.map(_.getAs[Long]("approx_micro")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b)
        case _ => ()
      }
      sorted.foreach(r => assert(r.getAs[Long]("neighbor_id") >= 5L))
    }
    // the cell restriction changes WHICH pairs rank, never a pair's
    // distance: any (query, neighbor) also in the full-scan ADC top-5
    // carries the identical approx_micro (one pqAdcLut definition)
    val full = SparkEntry.queries("similarity_pq_adc_topk")(spark, d).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("approx_micro")).toMap
    val shared = rows.flatMap { r =>
      full.get((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .map(m => (r.getAs[Long]("approx_micro"), m))
    }
    assert(shared.nonEmpty, "probe and full scan share at least one pair")
    shared.foreach { case (a, b) => assert(a === b) }
    // the IVF promise in the plan: a cell-keyed probe, never a cartesian
    assert(!plan("similarity_ann_ivfpq").contains("CartesianProduct"))
  }

  test("similarity_ann_ivfpq_nprobe2: widens candidates, never worsens a query's ADC top") {
    // the nprobe=2 probe sees a SUPERSET of the one-cell candidates, so
    // per query its rank-1 approx distance is <= the one-cell probe's,
    // every invariant of the sibling holds, and shared pairs carry the
    // identical integer ADC distance (one pqAdcLut definition)
    val one = SparkEntry.queries("similarity_ann_ivfpq")(spark, d).collect()
    val two = SparkEntry.queries("similarity_ann_ivfpq_nprobe2")(spark, d).collect()
    assert(two.nonEmpty)
    def best(rows: Array[org.apache.spark.sql.Row]) = rows
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("approx_micro")).min }
    val b1 = best(one); val b2 = best(two)
    assert(b2.keySet === b1.keySet)
    b2.foreach { case (q, m2) =>
      assert(m2 <= b1(q), s"query $q: nprobe=2 best $m2 worse than one-cell ${b1(q)}")
    }
    two.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to sorted.length).toSeq, s"query $q ranks must be dense from 1")
      assert(sorted.length <= 5)
      sorted.foreach(r => assert(r.getAs[Long]("neighbor_id") >= 5L))
    }
    assert(!plan("similarity_ann_ivfpq_nprobe2").contains("CartesianProduct"))
  }

  test("multimodal_audio_downsample: frame counts and energy bound the full decode") {
    val dec = SparkEntry.queries("multimodal_audio_downsample")(spark, d).collect()
    assert(dec.nonEmpty)
    val full = SparkEntry.queries("multimodal_audio_features")(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("channel")) ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("sum_sq"))).toMap
    dec.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val c = r.getAs[Long]("channel")
      val nOut = r.getAs[Long]("n_frames_out")
      val (nFull, sqFull) = full((id, c))
      assert(nFull === 100L + id % 400, "synthesis contract")
      assert(nOut === (nFull + 3) / 4, s"doc $id ch $c: decimate-by-4 count")
      // a kept-frame subset can never carry more energy than the stream
      assert(r.getAs[Long]("sum_sq") <= sqFull)
      // crossings are counted between consecutive KEPT frames
      assert(r.getAs[Long]("zero_crossings") <= nOut - 1)
    }
    // every (doc, channel) of the full decode is present after decimation
    assert(dec.length === full.size)
  }

  test("events_funnel_steps: one user exchange; step counts are monotone") {
    val p = plan("events_funnel_steps")
    // all three step windows + the per-user distinct ride ONE user_id
    // partitioning (the at-scale promise: a single shuffle of the events)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size === 1, p)
    val rows = SparkEntry.queries("events_funnel_steps")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("n_entered")
      val c = r.getAs[Long]("n_clicked")
      val pu = r.getAs[Long]("n_purchased")
      assert(e >= c && c >= pu && pu >= 0,
        s"${r.getAs[java.sql.Date]("cohort_date")}: $e/$c/$pu not a funnel")
      assert(r.getAs[Double]("click_rate") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("purchase_rate") <= r.getAs[Double]("click_rate") + 1e-9)
    }
  }
}

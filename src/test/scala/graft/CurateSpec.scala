package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ml.{Curate, TextOps}

/** The composed curation pipeline: dedup survivors, scrubbed text,
  * self-consistent quality, deterministic split — on synthetic docs with
  * planted PII and duplicates (the testdata corpus has neither worst
  * case; the oracles cover it at corpus scale via the judged gates).
  */
class CurateSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "s1", "the quick brown fox jumps over a lazy dog of note"),
      (2L, "s1", "the quick brown fox jumps over a lazy dog of note"), // dup of 1
      (3L, "s2", "call me at 555-0199 or mail jo.doe@example.org today"),
      (4L, "s2", "ssn 123-45-6789 should never survive curation at all"),
      (5L, "s3", "completely distinct content with no sensitive data here"))
      .toDF("doc_id", "source", "text")
  }

  test("curate dedups, scrubs every PII class, and assigns stable splits") {
    val out = Curate.curate(docs).orderBy(col("doc_id")).collect()
    // duplicate content: only the first-seen doc survives
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L, 4L, 5L))
    val texts = out.map(_.getAs[String]("text"))
    // every entity class redacted, nothing else touched
    assert(texts(1).contains("[PHONE]") && texts(1).contains("[EMAIL]"))
    assert(texts(2).contains("[SSN]") && !texts(2).contains("123-45"))
    assert(texts(3) === "completely distinct content with no sensitive data here")
    // no raw PII pattern survives anywhere
    for (t <- texts; p <- Seq(TextOps.SsnPat, TextOps.PhonePat, TextOps.EmailPat))
      assert(!p.r.findFirstIn(t).isDefined, s"unscrubbed PII in: $t")
    // quality in [0,1]; split is a pure function of the scrubbed text
    assert(out.forall { r =>
      val q = r.getAs[Double]("quality"); q >= 0.0 && q <= 1.0 })
    val again = Curate.curate(docs).orderBy(col("doc_id")).collect()
    assert(out.map(_.getAs[String]("split")).toSeq ===
      again.map(_.getAs[String]("split")).toSeq)
  }

  test("curate digests POST-normalization: decomposed and composed twins dedup") {
    import spark.implicits._
    // identical content, one decomposed (e + combining acute U+0301), one
    // precomposed (U+00E9) — byte-distinct, NFC-identical. The round-15
    // normalize-before-digest contract must collapse them to ONE
    // survivor (the first-seen), shipping the composed form.
    val twins = Seq(
      (1L, "s1", "café terrace at night"),
      (2L, "s1", "café terrace at night"),
      (3L, "s2", "plain ascii stays untouched"))
      .toDF("doc_id", "source", "text")
    val out = Curate.curate(twins).orderBy(col("doc_id")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L),
      "NFC twins must share a digest — only the first-seen survives")
    assert(out.head.getAs[String]("text") === "café terrace at night",
      "the shipped text is the composed (NFC) form")
    assert(out(1).getAs[String]("text") === "plain ascii stays untouched")
  }

  test("decontaminate drops exactly the docs sharing a 4-gram with the benchmark") {
    import spark.implicits._
    // doc 1 shares the 4-gram "quick brown fox jumps"; doc 5 shares none
    val bench = Seq((100L, "b", "a very quick brown fox jumps high today"))
      .toDF("doc_id", "source", "text")
    val kept = Curate.decontaminate(docs, bench)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(3L, 4L, 5L))  // 1 and its dup 2 both flagged
    // benchmark membership must be a broadcast LEFT SEMI in the plan
    val p = Curate.decontaminate(docs, bench).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
  }

  test("property: generated PII never survives scrubbing; quality stays in [0,1]") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
    val ssn = for (a <- Gen.choose(0, 999); b <- Gen.choose(0, 99); c <- Gen.choose(0, 9999))
      yield f"$a%03d-$b%02d-$c%04d"
    val phone = for (a <- Gen.choose(0, 999); b <- Gen.choose(0, 9999))
      yield f"$a%03d-$b%04d"
    val email = for (u <- word; h <- word) yield s"$u@$h.com"
    val doc = for {
      ws <- Gen.nonEmptyListOf(word); pii <- Gen.oneOf(ssn, phone, email)
      pos <- Gen.choose(0, ws.length)
    } yield (ws.take(pos) ++ Seq(pii) ++ ws.drop(pos)).mkString(" ")
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
        .toDF("doc_id", "source", "text")
      val rows = df.select(
        TextOps.scrubPii(col("text")).as("scrubbed"),
        TextOps.qualityScore(split(col("text"), " "),
          length(col("text")).cast("long")).as("q")).collect()
      rows.forall { r =>
        val t = r.getString(0); val q = r.getDouble(1)
        Seq(TextOps.SsnPat, TextOps.PhonePat, TextOps.EmailPat)
          .forall(p => p.r.findFirstIn(t).isEmpty) && q >= 0.0 && q <= 1.0
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop).passed)
  }

  test("dedupEmbeddings: drops higher-id near-dups among SURVIVORS only; no-embedding docs kept") {
    import spark.implicits._
    // survivors 1, 3, 4, 5, 7 (doc 2 is the planted exact dup of 1)
    val curated = Curate.curate(docs.unionAll(Seq(
      (7L, "s3", "another fully distinct document that certainly survives ok"))
      .toDF("doc_id", "source", "text")))
    def vec(hot: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == hot) 1.0f else 0.0f)
    val embeddings = Seq(
      (1L, vec(0)),  // survivor
      (3L, vec(1)),  // survivor, orthogonal to 1 (cosine 0 < τ) — kept
      (5L, vec(0)),  // survivor, identical to 1 (cosine 1) — dropped (higher id)
      (0L, vec(2)),  // NOT a survivor (no doc 0): must not count as a neighbor
      (7L, vec(2))   // survivor; its ONLY near-dup is non-survivor 0 — kept
      // doc 4 has no embedding row at all — kept by construction
    ).toDF("vec_id", "embedding")
    val out = Curate.dedupEmbeddings(curated, embeddings, tau = 0.35)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L, 4L, 7L),
      s"expected 5 dropped (near-dup of 1), 4 kept (no embedding), " +
        s"7 kept (neighbor 0 is not a survivor); got $out")
    // the stage never drops the LOWER id of a pair
    assert(out.contains(1L))
  }

  test("sampleWeighted: deterministic, subset, and quality-1.0 docs always kept") {
    import spark.implicits._
    // 100 long non-stopword words → quality exactly 1.0 (thresh = 1e6,
    // every hash draw < 1e6 accepts); a 1-word doc scores low
    val perfect = (1 to 100).map(i => f"verylongword$i%04d").mkString(" ")
    val many = (0 until 40).map(i => (i.toLong, s"s${i % 3}", s"$perfect tail$i")) :+
      (99L, "s9", "tiny")
    val curated = Curate.curate(many.toDF("doc_id", "source", "text"))
    val kept = Curate.sampleWeighted(curated)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // pure function of content: second run identical
    val again = Curate.sampleWeighted(curated)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === again)
    val all = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(all.contains))
    // every quality-1.0 doc is unconditionally kept
    val perfectIds = curated.filter(col("quality") === 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(perfectIds.nonEmpty && perfectIds.subsetOf(ids.toSet))
  }

  test("dedupAgainst matches the dedup_incremental_anti gate's survivors") {
    // same data, same partition as the gate: corpus = doc_id%10==0 slice,
    // batch = the rest, both over raw sf0.001 documents — the product
    // stage must reproduce the judged per-source counts and id checksum
    val d = "/root/testdata/sf0.001"
    val all = graft.tables.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val kept = Curate.dedupAgainst(
      all.filter(col("doc_id") % 10 =!= 0),
      all.filter(col("doc_id") % 10 === 0))
    val got = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        (sum(col("doc_id") % lit(2147483647L)) % lit(2147483647L)).as("ck"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("ck"))).toMap
    val gate = SparkEntry.queries("dedup_incremental_anti")(spark, d)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_checksum"))).toMap
    // a source whose batch docs all collide appears in the gate with
    // n_kept=0 but has no surviving rows here
    assert(got.keySet.subsetOf(gate.keySet))
    gate.foreach { case (src, v) => assert(got.getOrElse(src, (0L, 0L)) === v) }
    // survivors keep their full rows (payload re-attached after the
    // id-only digest join)
    assert(kept.columns.toSeq === Seq("doc_id", "source", "text"))
  }

  test("dedupAgainst prunes the payload off the digest-keyed anti join") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val batch = Seq((1L, "s", "aa"), (2L, "s", "bb")).toDF("doc_id", "source", "text")
    val corpus = Seq((10L, "s", "aa")).toDF("doc_id", "source", "text")
    val lp = Curate.dedupAgainst(batch, corpus).queryExecution.optimizedPlan
    val anti = lp.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(anti.nonEmpty)
    // the digest join's inputs are id+digest only — the payload re-attaches
    // later via the doc_id-keyed semi join
    anti.foreach { j =>
      assert(j.left.output.map(_.name).toSet === Set("doc_id", "digest"))
      assert(j.right.output.map(_.name).toSet === Set("digest"))
    }
  }

  test("curate_e2e_census gate equals the CLI artifact's read-back census") {
    // the judged gate computes the census from the live plan; the CLI
    // writes the curated corpus partitioned by split and a user censuses
    // what they READ BACK. Both must agree — this pins the partitioned
    // write round-trip (split recovered from directory names, quality
    // surviving parquet) to the judged contract, with the CLI's exact
    // stage composition and the gate's binding 0.65 threshold.
    val d = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-curate-cli").toString
    val docs = graft.tables.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    Curate.curate(docs, minQuality = 0.65)
      .write.mode("overwrite").partitionBy("split").parquet(out)
    val fromDisk = Curate.census(spark.read.parquet(out)).collect()
    val gate = SparkEntry.queries("curate_e2e_census")(spark, d).collect()
    assert(fromDisk.toSeq === gate.toSeq)
    assert(gate.nonEmpty)
    // the quality filter genuinely binds on the fixture corpus
    assert(gate.map(_.getAs[Long]("n")).sum < docs.count())
  }

  test("vocabProfile is the judged text_zipf_fit contract, one shared definition") {
    // same input → identical values: the product's drift alarm IS the
    // oracle-judged computation (TextOps.zipfFit), not a reimplementation
    val d = "/root/testdata/sf0.001"
    val viaGate = SparkEntry.queries("text_zipf_fit")(spark, d).collect().head
    val viaProduct = Curate.vocabProfile(
      graft.tables.Tables.documents(spark, d)).collect().head
    assert(viaProduct === viaGate)
    // the synthetic word-soup corpus is near-uniform by design, so its
    // slope sits far ABOVE natural language's -1 (measured -0.179 at
    // sf0.001) — which is exactly what the drift alarm exists to flag;
    // pin only the sign and finiteness here
    val slope = viaProduct.getAs[Double]("zipf_slope")
    assert(slope < 0.0 && slope > -3.0, s"implausible zipf slope $slope")
    assert(viaProduct.getAs[Long]("n_ranks") > 0L)
    // a curated (scrubbed, deduped) frame profiles too — the CLI path
    val curated = Curate.curate(docs)
    val row = Curate.vocabProfile(curated).collect().head
    assert(row.getAs[Long]("n_ranks") > 0L)
    assert(!row.isNullAt(0) && !row.isNullAt(1))
  }

  test("spanProfile is the judged dedup_substring_spans contract, aggregated") {
    // same input → the product's one-row coverage alarm is exactly the
    // aggregate of the oracle-judged per-doc gate rows (ONE shared span
    // definition, CurationQueries.substringSpans)
    val d = "/root/testdata/sf0.001"
    val gate = SparkEntry.queries("dedup_substring_spans")(spark, d).collect()
    val prof = Curate.spanProfile(
      graft.tables.Tables.documents(spark, d)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))).collect().head
    assert(prof.getAs[Long]("n_docs_flagged") === gate.length.toLong)
    assert(prof.getAs[Long]("dup_tokens") ===
      gate.map(_.getAs[Long]("dup_tokens")).sum)
    val corpusTokens = prof.getAs[Long]("corpus_tokens")
    assert(corpusTokens >= gate.map(_.getAs[Long]("n_tokens")).sum)
    assert(prof.getAs[Double]("coverage") > 0.0 &&
      prof.getAs[Double]("coverage") <= 1.0)
    // a curated (scrubbed, deduped) frame profiles too — the CLI path:
    // dup tokens can never exceed the corpus, coverage stays a fraction,
    // and flagged docs cannot outnumber the survivors
    val curated = Curate.curate(docs)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val row = Curate.spanProfile(curated).collect().head
    assert(row.getAs[Long]("n_docs_flagged") <= curated.count())
    if (!row.isNullAt(2)) {
      assert(row.getAs[Long]("dup_tokens") <= row.getAs[Long]("corpus_tokens"))
      val cov = row.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0, s"coverage $cov outside [0,1]")
    }
  }

  test("mixtureProfile: judged aggregation tail over BPE-exact token counts") {
    // round 16: the PRODUCT's mixture weights budget in BPE tokens, not
    // whitespace words — weight ∝ √tokens, and word counts mis-weight
    // sources whose tokens-per-word differ. Round 17: the definition is
    // the PRODUCTION 1024-merge vocabulary — this test pins the tokens
    // column EQUAL to the judged text_tokenize_bpe_trie engine
    // (TextOps.bpeTokens occurrence rows) counted per source, and the
    // divergence from the word-count gate as real.
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, length, split}
    val input = graft.tables.Tables.documents(spark, d)
      .select(col("source"), col("text"))
      .withColumn("quality", graft.ml.TextOps.qualityScore(
        split(col("text"), " "), length(col("text")).cast("long")))
    val rows = Curate.mixtureProfile(input).collect()
    val bpePerSource = graft.ml.TextOps.bpeTokens(
        graft.tables.Tables.documents(spark, d), graft.ml.TextOps.BpeMerges1k)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      r.getAs[Long]("tokens") === bpePerSource(r.getAs[String]("source")),
      s"${r.getAs[String]("source")}: mixture tokens are not the judged BPE count"))
    // and BPE genuinely differs from words here — the switch is load-bearing
    val wordsPerSource = SparkEntry.queries("sample_mixture_weights")(spark, d)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("tokens")).toMap
    assert(bpePerSource !== wordsPerSource)
    // the curated (scrubbed, deduped) frame profiles too — the CLI path:
    // weights renormalize over survivors and still sum to ~1
    val curated = Curate.curate(docs)
    val prows = Curate.mixtureProfile(curated).collect()
    assert(prows.nonEmpty)
    val wsum = prows.map(_.getAs[Double]("weight")).sum
    assert(wsum > 1.0 - 2e-5 && wsum <= 1.0 + 2e-5, s"weights sum to $wsum")
  }

  test("min-quality gate filters and census aggregates per (split, source)") {
    val curated = Curate.curate(docs)
    val qs = curated.select(min(col("quality")), max(col("quality")))
      .head(); val lo = qs.getDouble(0); val hi = qs.getDouble(1)
    assert(lo < hi)
    // a threshold strictly between lo and hi drops at least one doc
    val mid = (lo + hi) / 2
    assert(Curate.curate(docs, minQuality = mid).count() < curated.count())
    val cen = Curate.census(curated).collect()
    assert(cen.map(_.getAs[Long]("n")).sum === curated.count())
    assert(cen.forall(r => r.getAs[Double]("avg_quality") >= 0.0))
    // census bpe_tokens (round 17) is the judged text_tokenize_bpe_trie
    // definition — the 1024-merge production vocabulary, counted by the
    // gate's own engine (TextOps.bpeTokens occurrence rows) — summed
    // over the scrubbed survivors per (split, source); docs that scrub
    // to zero words count 0, not drop
    import org.apache.spark.sql.functions.{coalesce, count => fcount,
      lit => flit, sum => fsum}
    val perDoc = graft.ml.TextOps.bpeTokens(
        curated.select(col("doc_id"), col("source"), col("text")),
        graft.ml.TextOps.BpeMerges1k)
      .groupBy(col("doc_id")).agg(fcount(flit(1)).as("t"))
    val expected = curated.select(col("doc_id"), col("split"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("split"), col("source"))
      .agg(fsum(coalesce(col("t"), flit(0L))).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    cen.foreach(r => assert(
      r.getAs[Long]("bpe_tokens")
        === expected((r.getString(0), r.getString(1))),
      s"census bpe_tokens drifted from the judged token definition"))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps.{vecDot, vecNorm}
import graft.ml.TextOps
import graft.queries.QueryDsl._
import graft.tables.Tables

/** Round-14 curation additions: the training-data operations the r1–r13
  * inventory still lacked — substring-span dedup (the ExactSubstr idea of
  * Lee et al. 2022, arXiv:2107.06499, at word-k-gram granularity),
  * asymmetric n-gram containment (near-superset detection, the direction
  * Jaccard is blind to), Johnson–Lindenstrauss random projection (the
  * dimensionality-reduction leg of the similarity family), and an event
  * funnel (ordered-step conversion over the events stream). Every gate is
  * DuckDB-oracle-judged like the rest of the registry.
  */
object CurationQueries {

  /** Span gram width (words). 8 is the judged contract: long enough that
    * random word soup rarely collides (the sf0.01 corpus still carries
    * ~1k genuinely duplicated 8-grams from its planted near-dup pairs),
    * short enough that real boilerplate is caught.
    */
  private val SpanK = 8

  /** Committed 32k-BPE encode-sheet fixture — the AnalyzerGates.fixtureDir
    * resolution order (see `text_tokenize_bpe_32k`).
    */
  private[graft] def bpe32kFixtureDir: String =
    sys.props.get("graft.gate.bpe32kFixtureDir")
      .orElse(sys.env.get("GRAFT_BPE32K_FIXTURE_DIR"))
      .orElse(Option(getClass.getResource("/bpe32k_gate"))
        .filter(_.getProtocol == "file")
        .map(u => java.nio.file.Paths.get(u.toURI).toString))
      .getOrElse("/root/repo/src/test/resources/bpe32k_gate")

  /** Doc-df cap for the source-overlap matrix's word 8-grams: a gram in
    * more docs than this is boilerplate (matches everything, carries no
    * overlap signal) and would contribute df² candidate pair rows — the
    * ShingleDfCap rationale at the 8-gram/source grain.
    */
  private val SrcGramDfCap = 5L


  // ---- JL random projection sign matrix ---------------------------------
  // Deterministic ±1 signs from md5 parity of "rp|i|j" — a pure public
  // function both engines can evaluate: Scala precomputes the 16×64
  // matrix ONCE on the driver (it is a constant of the operator, not of
  // the data) and embeds it as plan literals, so the per-row work is
  // exactly one FloatVecDot per output dimension — narrow, codegen'd,
  // shuffle-free. The DuckDB oracle recomputes the same md5 parity
  // inline. E[sign]=0 and the md5 bits are independent across (i,j),
  // which is all the JL guarantee needs (Achlioptas 2003: ±1 entries
  // suffice; scaling by 1/√d' preserves expected norms).
  private val ProjDims = 16
  private val SrcDims = 64

  /** THE micro-unit embedding lattice: elements pinned to 1e-6 integers
    * (floor(x·1e6 + 0.5) of the exact float→double value). ONE spelling
    * shared by embedding_pca_power, embedding_norm_outliers, and
    * sample_coreset_kcenter — the byte-identical expression is what
    * keeps their integer lattices (and therefore their oracles)
    * consistent, the lshBucketed rationale applied to quantization.
    */
  private[graft] val microVecExpr: String =
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  /** Oracle twin of [[microVecExpr]]: CTE `em(vec_id, i, xv)` with
    * 1-based i over the 64 dims.
    */
  private[queries] val emCteSql: String =
    """em AS (
      |  SELECT vec_id, i,
      |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS xv
      |  FROM embeddings, generate_series(1, 64) t(i)
      |)""".stripMargin

  private def md5FirstHexEven(key: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "02468ace".indexOf(f"${d(0) & 0xff}%02x".charAt(0)) >= 0
  }

  /** Per-doc duplicated-span statistics over a `(doc_id, w)` word-array
    * relation: `(doc_id, n_spans, dup_tokens, n_tokens, dup_frac)` for
    * every doc carrying at least one duplicated 8-gram — the ONE span
    * definition shared by the judged `dedup_substring_spans` gate and
    * the curate product's span-coverage profile (Curate.spanProfile),
    * so the product line cannot drift from what the oracle verified.
    */
  private[graft] def substringSpans(words: DataFrame): DataFrame = {
    val k = SpanK
    val grams = words
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        posexplode(expr(TextOps.wordNGramsExpr(k))))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        md5(col("col")).as("gh"))
    val dupGrams = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gh"))
    val hits = grams.join(dupGrams, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    val prevEnd = max(col("pos") + lit(k)).over(
      Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val islands = hits
      .withColumn("new_island",
        when(prevEnd.isNull || col("pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + lit(k)).as("e"),
        min(col("n_tokens")).as("n_tokens"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).cast("long").as("dup_tokens"),
        min(col("n_tokens")).as("n_tokens"))
      .withColumn("dup_frac",
        r6(col("dup_tokens").cast("double") / col("n_tokens")))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"), col("dup_frac"))
  }

  /** The 5 query vectors (vec_id < 5) with their float arrays, driver
    * side — shared by the ADC ranking and the recall calibration.
    */
  private def pqQueries(s: SparkSession, d: String): Array[(Long, Array[Float])] =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 5).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** ADC ranking over the PQ codes: `(query_id, neighbor_id, rank,
    * approx_micro)` for EVERY database vector (rank unfiltered) — ONE
    * definition for the `similarity_pq_adc_topk` gate and the
    * `similarity_pq_recall` calibration, so the calibrated index is
    * exactly the one the search gate ships.
    * LUT[q][sub][c] in micro-units: floor(Σ(q_i−cb_i)²·1e6+0.5),
    * index-order fold (the vecNorm arithmetic), so DuckDB's per-pair
    * SUM sees the same value to well below the 1e-6 grid.
    */
  /** Per-query ADC lookup table: LUT[q][sub][c] =
    * floor(Σ(q_i−cb_i)²·1e6+0.5), index-order fold — shared by the
    * full-scan ADC ranking and the IVF-restricted probe.
    */
  private def pqAdcLut(queries: Array[(Long, Array[Float])],
      cb: Seq[(Long, Array[Array[Float]])]): Array[Array[Array[Long]]] =
    queries.map { case (_, qv) =>
      Array.tabulate(NSub) { sub =>
        cb.map { case (_, blocks) =>
          val b = blocks(sub)
          var acc = 0.0
          var i = 0
          while (i < SubDim) {
            val diff = qv(sub * SubDim + i).toDouble - b(i).toDouble
            acc += diff * diff
            i += 1
          }
          math.floor(acc * 1000000.0 + 0.5).toLong
        }.toArray
      }
    }.toArray

  /** `Σ_sub LUT[qix][sub][code_sub]` over a codes relation carrying a
    * 1-based `qix` column — four integer array lookups per row.
    */
  private def adcApproxCol(lutCol: Column): Column =
    (0 until NSub).map { sub =>
      element_at(element_at(element_at(lutCol, col("qix")), lit(sub + 1)),
        (col(s"c$sub") + 1).cast("int"))
    }.reduce(_ + _)

  private[queries] def pqAdcRanked(s: SparkSession, d: String): DataFrame =
    pqAdcRankedWith(s, d, pqCodebook(s, d))

  /** [[pqAdcRanked]] generalized over the codebook (cids must be the
    * contiguous position run — the seed path asserts it, the trained
    * path has it by construction): ONE ranking definition for the
    * sampled-codebook gates and the trained-codebook recall gate.
    */
  private def pqAdcRankedWith(s: SparkSession, d: String,
      cb: Seq[(Long, Array[Array[Float]])]): DataFrame = {
    val queries = pqQueries(s, d)
    val lutCol = typedLit(pqAdcLut(queries, cb))
    val qids = queries.map(_._1)
    val codes = pqCodes(s, d, Some(cb)).filter(col("vec_id") >= 5)
      .withColumn("qix", explode(typedLit(qids.indices.map(_ + 1).toArray)))
    codes
      .withColumn("query_id", element_at(typedLit(qids.toArray), col("qix")))
      .withColumn("approx_micro", adcApproxCol(lutCol))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx_micro"), col("vec_id"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("approx_micro"))
  }

  /** Oracle twin of [[pqAdcRanked]]: appends the `lut`/`approx`/`adc`
    * CTEs to [[pqCodesSql]]; `adc(query_id, neighbor_id, rank,
    * approx_micro)` ranked, unfiltered.
    */
  // lazy: textually precedes pqCodesSql/NSub, evaluated first inside `all`
  private lazy val pqAdcRankedSql: String = {
    val lutBlocks = (0 until NSub).map { sub =>
      val gs = s"generate_series(${sub * SubDim + 1}, ${(sub + 1) * SubDim}) t(i)"
      s"""SELECT q.vec_id AS query_id, $sub AS sub, c.vec_id AS cid,
         |    CAST(FLOOR((SELECT SUM((CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
         |        * (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))) FROM $gs)
         |      * 1000000.0 + 0.5) AS BIGINT) AS dmicro
         |  FROM embeddings q JOIN embeddings c ON c.vec_id < $PqK
         |  WHERE q.vec_id < 5""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""$pqCodesSql, lut AS (
       |  $lutBlocks
       |), approx AS (
       |  SELECT l.query_id, cd.vec_id AS neighbor_id,
       |    CAST(SUM(l.dmicro) AS BIGINT) AS approx_micro
       |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.cid = cd.code
       |  WHERE cd.vec_id >= 5 GROUP BY 1, 2
       |), adc AS (
       |  SELECT query_id, neighbor_id, approx_micro, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY approx_micro, neighbor_id) AS BIGINT)
       |    AS rank
       |  FROM approx
       |)""".stripMargin
  }

  private[graft] val projSigns: IndexedSeq[Array[Float]] =
    (0 until ProjDims).map { j =>
      Array.tabulate(SrcDims)(i =>
        if (md5FirstHexEven(s"rp|$i|$j")) 1.0f else -1.0f)
    }

  private def projSignSql(j: Int): String =
    s"(CASE WHEN strpos('02468ace', substr(md5('rp|' || (i-1) || '|$j'), 1, 1)) > 0 " +
      "THEN 1.0 ELSE -1.0 END)"

  // ---- product quantization ---------------------------------------------
  // m=4 subspaces × 16 dims, k=8 codewords per subspace. Codebooks reuse
  // the registry's ONE seed contract (vec_id < 8, the ivfAssigned /
  // ann_build seed rule): codebook[sub][c] = seed c's sub-block. k ≪ N,
  // so codebooks are driver literals exactly like the IVF centroids —
  // encode is a narrow map of 8 codegen dots per (row, subspace), no
  // join, no shuffle. Argmin score = r6(‖cb‖² − 2·x_sub·cb) (the ‖x_sub‖²
  // term is constant within a subspace and drops out of the argmin),
  // ties to the lowest codeword — the ivfAssigned tie rule.
  private val NSub = 4
  private val SubDim = 16
  private val PqK = 8

  /** Driver-collected seed sub-blocks: (cid, sub) -> 16 floats.
    * adcApproxCol indexes the LUT by codeword POSITION while the oracle
    * joins by cid — identical ONLY when the seed ids are exactly the
    * contiguous 0..PqK-1 run, so that contract is asserted at collect
    * time (round 15, ADVICE): a corpus with gaps in its low vec_ids
    * must fail here, not mis-rank silently on the Spark side alone.
    */
  private def pqCodebook(s: SparkSession, d: String): Seq[(Long, Array[Array[Float]])] = {
    val cb = Tables.embeddings(s, d)
      .filter(col("vec_id") < PqK).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        Array.tabulate(NSub)(sub =>
          r.getSeq[Float](1).slice(sub * SubDim, (sub + 1) * SubDim).toArray)))
      .sortBy(_._1).toSeq
    require(cb.map(_._1) == (0L until PqK.toLong),
      s"PQ seed vec_ids must be the contiguous 0..${PqK - 1} run " +
        s"(position-indexed LUT contract), got ${cb.map(_._1).mkString(",")}")
    cb
  }

  /** Index-order double fold of Σx², the exact arithmetic of vecNorm². */
  private def sq(v: Array[Float]): Double =
    v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)

  // ---- trained PQ codebooks (round 15) ----------------------------------
  // The k=8 SAMPLED codebook above is the correctness stand-in the r14
  // recall gate exposed (recall@5 = 0.0-0.4); an index-grade quantizer
  // TRAINS its codewords per subspace with Lloyd (Jégou et al. 2011 §II —
  // k-means in each 16-dim subspace). One round of the AnnIndex
  // build contract applied per subspace, k=16 codewords seeded from the
  // vec_id < 16 sub-blocks: assignment is 64 codegen'd dots per row
  // against plan-literal seeds (no join, no shuffle — identical shape to
  // encode), the update is ONE (sub, code, dim)-keyed aggregation, and
  // only 4·16·16 = 1024 longs ever reach the driver, so the training
  // pass costs one aggregation over the corpus at ANY scale. Trained
  // values are stored float32 exactly like AnnIndex.Model (micro-unit
  // integer means → (qmean/1e6).toFloat — order-independent and
  // engine-exact); an empty codeword carries its seed sub-block.
  // Codeword ids are POSITIONS 0..k-1 by construction, so the
  // position-indexed ADC LUT contract holds structurally here.
  private val PqTrainK = 16

  private[graft] final case class PqTrained(
      codebook: Array[Array[Array[Float]]], // [sub][code][dim within sub]
      census: Map[(Int, Int), Long])        // (sub, code) -> member count

  private def pqTrainedDetailed(s: SparkSession, d: String): PqTrained = {
    val seedRows = Tables.embeddings(s, d)
      .filter(col("vec_id") < PqTrainK).select(col("vec_id"), col("embedding"))
      .collect().sortBy(_.getLong(0))
    require(seedRows.map(_.getLong(0)).toSeq == (0L until PqTrainK.toLong),
      "PQ training seeds must be the contiguous 0..15 vec_id run " +
        s"(position-id contract), got ${seedRows.map(_.getLong(0)).mkString(",")}")
    val seeds: Array[Array[Array[Float]]] = seedRows.map(r =>
      Array.tabulate(NSub)(sub =>
        r.getSeq[Float](1).slice(sub * SubDim, (sub + 1) * SubDim).toArray))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // per-subspace nearest-seed assignment: argmin of the judged encode
    // score r6(‖cb‖² − 2·x_sub·cb), ties to the lowest codeword position —
    // ONE fused NearestCodeword expression per subspace (round 17:
    // constant plan size; the per-codeword column fan-out this replaces
    // cannot plan at a production k* = 256)
    val withCodes = (0 until NSub).foldLeft(e) { (df, sub) =>
      val blocks = (0 until PqTrainK).map(c => seeds(c)(sub))
      df.withColumn(s"tc$sub",
        graft.functions.VectorOps.nearestCodeword(col("embedding"),
          sub * SubDim, SubDim, (0 until PqTrainK).map(_.toLong),
          blocks, blocks.map(sq), returnScore = false).cast("int"))
    }
    // micro-unit integer mean per (sub, code, dim) — one exploded
    // aggregation pass over all 64 global dims
    val subOfGd = expr(s"CAST((gd - 1) div $SubDim AS INT)")
    val upd = withCodes
      .select((0 until NSub).map(sub => col(s"tc$sub")) ++
        Seq(col("embedding"), explode(expr("sequence(1, 64)")).as("gd")): _*)
      .select(
        subOfGd.as("sub"),
        (0 until NSub).foldRight(lit(-1)) { (sub, els) =>
          when(subOfGd === sub, col(s"tc$sub")).otherwise(els)
        }.as("code"),
        expr(s"CAST((gd - 1) % $SubDim + 1 AS BIGINT)").as("dim"),
        floor(expr("CAST(try_element_at(embedding, CAST(gd AS INT)) AS DOUBLE)")
          * lit(1000000.0) + lit(0.5)).cast("long").as("qv"))
      .groupBy(col("sub"), col("code"), col("dim"))
      .agg(sum(col("qv")).as("qsum"), count(col("qv")).as("cnt"))
      .withColumn("qmean",
        floor(col("qsum").cast("double") / col("cnt") + lit(0.5)).cast("long"))
      .collect()
    val bySubCode = upd.groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
    val census = bySubCode.map { case (k, rows) =>
      k -> rows.map(_.getAs[Long]("cnt")).max }
    val codebook = Array.tabulate(NSub) { sub =>
      Array.tabulate(PqTrainK) { c =>
        bySubCode.get((sub, c)) match {
          case Some(rows) =>
            val v = Array.fill(SubDim)(0.0f)
            rows.foreach(r => v(r.getAs[Long]("dim").toInt - 1) =
              (r.getAs[Long]("qmean") / 1000000.0).toFloat)
            v
          case None => seeds(c)(sub) // empty codeword: seed carries over
        }
      }
    }
    PqTrained(codebook, census)
  }

  /** Trained codebook in the (cid → sub-blocks) shape [[pqCodes]] and
    * [[pqAdcLut]] consume — cids are positions 0..15 by construction.
    */
  private def pqTrainedAsSeq(t: PqTrained): Seq[(Long, Array[Array[Float]])] =
    (0 until PqTrainK).map(c => (c.toLong,
      Array.tabulate(NSub)(sub => t.codebook(sub)(c))))

  /** Recall@5 of an ADC top-5 relation against the exact full-precision
    * L2² top-5 over the 5-query sample — ONE calibration definition for
    * the sampled-codebook gate and its trained sibling, so the two
    * recall numbers differ ONLY in the codebook they measure. Exact
    * distances use the micro-unit expansion ‖q‖² − 2q·x + ‖x‖² with
    * driver-fold ‖q‖² and the FloatVecDot kernel; the exact side is
    * bounded to the query sample (at 100 TB the sample stays fixed
    * while the index side scales).
    */
  private def pqRecallAgainstExact(s: SparkSession, d: String,
      adcTop: DataFrame): DataFrame = {
    val queries = pqQueries(s, d)
    val db = Tables.embeddings(s, d).filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding"),
        vecDot(col("embedding"), col("embedding")).as("xx"))
    val exactAll = queries.map { case (qid, qv) =>
      var qq = 0.0
      qv.foreach(x => qq += x.toDouble * x.toDouble)
      db.select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
        floor((lit(qq) - lit(2.0) * vecDot(col("embedding"), typedLit(qv))
          + col("xx")) * lit(1000000.0) + lit(0.5)).cast("long")
          .as("exact_micro"))
    }.reduce(_ unionAll _)
    val exact = exactAll
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("exact_micro"), col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val adc = adcTop
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    exact.join(adc, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall", r6(col("n_hits").cast("double") / col("n_exact")))
      .orderBy(col("query_id"))
  }

  /** Oracle twin of [[pqTrainedDetailed]]: CTE chain ending in
    * `tcent(sub, code, dim, v)` — the trained float32 codebook — plus
    * `tcensus(sub, code, n)`. Unrolls the one Lloyd round exactly like
    * the ann_build oracles: per-subspace seed assignment (4 UNION ALL
    * blocks with literal index ranges — generate_series cannot take
    * correlated bounds), micro-unit integer means stored float32, empty
    * codewords carrying their raw seed floats.
    */
  private lazy val pqTrainSql: String = {
    val subBlocks = (0 until NSub).map { sub =>
      val gs = s"generate_series(${sub * SubDim + 1}, ${(sub + 1) * SubDim}) t(i)"
      s"""SELECT e.vec_id, $sub AS sub, c.vec_id AS cid,
         |    ${r6Sql(
              s"(SELECT SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) FROM $gs)" +
              s" - 2 * (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) FROM $gs)")} AS score
         |  FROM embeddings e JOIN embeddings c ON c.vec_id < $PqTrainK""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""tsubsc AS (
       |  $subBlocks
       |), tcodes AS (
       |  SELECT vec_id, sub, cid AS code FROM (
       |    SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id, sub ORDER BY score ASC, cid) AS rn
       |    FROM tsubsc
       |  ) WHERE rn = 1
       |), texpl AS (
       |  SELECT t.sub, t.code, CAST(u.i AS BIGINT) AS dim,
       |    CAST(FLOOR(CAST(e.embedding[t.sub * $SubDim + u.i] AS DOUBLE)
       |      * 1000000.0 + 0.5) AS BIGINT) AS qv
       |  FROM tcodes t JOIN embeddings e USING (vec_id)
       |  CROSS JOIN generate_series(1, $SubDim) u(i)
       |), tupd AS (
       |  SELECT sub, code, dim, COUNT(qv) AS cnt,
       |    CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(qv) + 0.5) AS BIGINT) AS qmean
       |  FROM texpl GROUP BY 1, 2, 3
       |), tseed AS (
       |  SELECT CAST((gi - 1) // $SubDim AS INT) AS sub, c.vec_id AS code,
       |    CAST((gi - 1) % $SubDim + 1 AS BIGINT) AS dim,
       |    CAST(c.embedding[gi] AS FLOAT) AS sv
       |  FROM embeddings c CROSS JOIN generate_series(1, 64) g(gi)
       |  WHERE c.vec_id < $PqTrainK
       |), tcent AS (
       |  SELECT g.sub, g.code, g.dim,
       |    COALESCE(CAST(CAST(u.qmean AS DOUBLE) / 1000000.0 AS FLOAT), g.sv) AS v
       |  FROM tseed g LEFT JOIN tupd u
       |    ON u.sub = g.sub AND u.code = g.code AND u.dim = g.dim
       |), tcensus AS (
       |  SELECT sub, code, MAX(cnt) AS n FROM tupd GROUP BY 1, 2
       |)""".stripMargin
  }

  /** `(vec_id, c0..c3, err_micro)` — the PQ encoding of every vector plus
    * its integer-exact micro-unit quantization error. Shared by the
    * encode gate and the ADC gate.
    */
  private[graft] def pqCodes(s: SparkSession, d: String,
      codebook: Option[Seq[(Long, Array[Array[Float]])]] = None): DataFrame = {
    // the ADC gate passes its already-collected codebook so the gate runs
    // ONE driver-side collect job, not two identical ones
    val cb = codebook.getOrElse(pqCodebook(s, d))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // per-subspace argmin + its winning score as TWO fused NearestCodeword
    // expressions (round 17 — constant plan size at any k*; candidates in
    // cb list order = ascending id, the judged tie rule). The winning
    // score IS the running min, so the score variant equals the old
    // chosen-by-code lookup by construction.
    val withScores = (0 until NSub).foldLeft(e) { (df, sub) =>
      val x = slice(col("embedding"), sub * SubDim + 1, SubDim)
      val ids = cb.map(_._1)
      val blocks = cb.map(_._2(sub))
      def nc(score: Boolean) =
        graft.functions.VectorOps.nearestCodeword(col("embedding"),
          sub * SubDim, SubDim, ids, blocks, blocks.map(sq), score)
      df.withColumn(s"c$sub", nc(score = false))
        .withColumn(s"err_$sub",
          floor((vecDot(x, x) + nc(score = true)) * lit(1000000.0) + lit(0.5))
            .cast("long"))
    }
    withScores.withColumn("err_micro",
      (0 until NSub).map(sub => col(s"err_$sub")).reduce(_ + _))
      .select(col("vec_id") +: (0 until NSub).map(sub => col(s"c$sub")) :+
        col("err_micro"): _*)
  }

  /** Oracle twin of [[pqCodes]]: CTEs ending in `codes(vec_id, sub, code,
    * err_micro_sub)` (long format — one row per subspace).
    */
  private val pqCodesSql: String = {
    // DuckDB's generate_series cannot take correlated bounds, so the 4
    // subspaces unroll to a UNION ALL with literal index ranges.
    val subBlocks = (0 until NSub).map { sub =>
      val gs = s"generate_series(${sub * SubDim + 1}, ${(sub + 1) * SubDim}) t(i)"
      s"""SELECT e.vec_id, $sub AS sub, c.vec_id AS cid,
         |    ${r6Sql(
              s"(SELECT SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) FROM $gs)" +
              s" - 2 * (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) FROM $gs)")} AS score,
         |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM $gs) AS xx
         |  FROM embeddings e JOIN embeddings c ON c.vec_id < $PqK""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""subsc AS (
       |  $subBlocks
       |), codes AS (
       |  SELECT vec_id, sub, cid AS code,
       |    CAST(FLOOR((xx + score) * 1000000.0 + 0.5) AS BIGINT) AS err_micro_sub
       |  FROM (
       |    SELECT vec_id, sub, cid, score, xx, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id, sub ORDER BY score ASC, cid) AS rn
       |    FROM subsc
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  val all: Seq[NamedQuery] = Seq(

    // Substring-span dedup (Lee et al. 2022 "Deduplicating Training Data
    // Makes Language Models Better", arXiv:2107.06499): find maximal
    // duplicated spans — runs of word 8-grams that also occur in another
    // document — and report per-doc span count / covered tokens /
    // coverage fraction. The paper's suffix array is a single-machine
    // structure; the Spark-first equivalent is gram-granular: posexplode
    // the positioned 8-grams (reusing the decontamination gate's ONE
    // n-gram spelling, TextOps.wordNGramsExpr), keep grams whose md5
    // digest appears in >1 distinct doc, then merge overlapping/adjacent
    // hit positions into maximal spans with a classic gaps-and-islands
    // window (running max of span end over preceding hits).
    // At 100 TB: the gram relation shuffles (digest, doc_id, pos) only —
    // 16-byte digests, never text; the duplicated-digest set is a
    // hash-agg + left-semi join on the digest (bounded memory — no
    // collect_list of per-gram postings, which boilerplate grams would
    // blow up); the island windows partition by doc_id, the same key the
    // corpus is already bucketed by downstream.
    NamedQuery(
      "dedup_substring_spans",
      (s, d) => substringSpans(
        // scan fan-out before the positioned 8-gram explode + md5 (r21
        // A/B at sf0.1: 2.27 s -> 1.49 s); no-op at production split counts
        fanout(Tables.documents(s, d).select(col("doc_id"), col("text")))
          .select(col("doc_id"), split(col("text"), " ").as("w")))
        .orderBy(col("doc_id")),
      Some(s"""WITH wrds AS (
              |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
              |), grams AS (
              |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
              |    i - 1 AS pos,
              |    md5(array_to_string(w[i:i+${SpanK - 1}], ' ')) AS gh
              |  FROM wrds, LATERAL (SELECT unnest(generate_series(1,
              |    len(w) - ${SpanK - 1})) AS i) t
              |  WHERE len(w) >= $SpanK
              |), dup AS (
              |  SELECT gh FROM grams GROUP BY gh
              |  HAVING COUNT(DISTINCT doc_id) > 1
              |), hits AS (
              |  SELECT g.doc_id, g.n_tokens, g.pos
              |  FROM grams g JOIN dup USING (gh)
              |), isl AS (
              |  SELECT doc_id, n_tokens, pos,
              |    CASE WHEN MAX(pos + $SpanK) OVER (PARTITION BY doc_id
              |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
              |        AND 1 PRECEDING) IS NULL
              |      OR pos > MAX(pos + $SpanK) OVER (PARTITION BY doc_id
              |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
              |        AND 1 PRECEDING)
              |      THEN 1 ELSE 0 END AS ni
              |  FROM hits
              |), isl2 AS (
              |  SELECT doc_id, n_tokens, pos,
              |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
              |  FROM isl
              |), spans AS (
              |  SELECT doc_id, island, MIN(pos) AS s,
              |    MAX(pos) + $SpanK AS e, MIN(n_tokens) AS n_tokens
              |  FROM isl2 GROUP BY 1, 2
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
              |  CAST(SUM(e - s) AS BIGINT) AS dup_tokens,
              |  MIN(n_tokens) AS n_tokens,
              |  ${r6Sql("CAST(SUM(e - s) AS DOUBLE) / MIN(n_tokens)")} AS dup_frac
              |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Asymmetric n-gram containment — |A∩B| / min(|A|,|B|) with both
    // directional ratios: the near-SUPERSET detector Jaccard misses (a
    // doc fully embedded in a 10× larger one has Jaccard ≈ 0.1 but
    // containment 1.0 — quote-inclusion and template-expansion dups in a
    // crawl corpus). The candidate pipeline is LITERALLY
    // dedup_ngram_jaccard's (MLQueries.cappedShinglePairs, one Scala +
    // one SQL definition, one ShingleDfCap constant) — the two measures
    // differ only in their denominator — so at 100 TB the only wide ops
    // are the sh-keyed exchange (strings the size of three words) and
    // the pair aggregation; hub shingles are capped at df-cap² candidate
    // pairs each.
    NamedQuery(
      "similarity_containment",
      (s, d) =>
        MLQueries.cappedShinglePairs(s, d)
          .withColumn("cont_a_in_b", r6(col("shared").cast("double") / col("na")))
          .withColumn("cont_b_in_a", r6(col("shared").cast("double") / col("nb")))
          .withColumn("containment",
            r6(col("shared").cast("double") / least(col("na"), col("nb"))))
          .select(col("doc_a"), col("doc_b"), col("cont_a_in_b"),
            col("cont_b_in_a"), col("containment"))
          .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
          .limit(10),
      Some(s"""WITH ${MLQueries.cappedShinglePairsSql}
              |SELECT doc_a, doc_b,
              |  ${r6Sql("CAST(shared AS DOUBLE) / sa.n_sh")} AS cont_a_in_b,
              |  ${r6Sql("CAST(shared AS DOUBLE) / sb.n_sh")} AS cont_b_in_a,
              |  ${r6Sql("CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh)")}
              |    AS containment
              |FROM pairs
              |JOIN sizes sa ON sa.doc_id = doc_a
              |JOIN sizes sb ON sb.doc_id = doc_b
              |ORDER BY containment DESC, doc_a, doc_b LIMIT 10""".stripMargin)),

    // Johnson–Lindenstrauss random projection, 64 → 16 dims: out_j =
    // dot(embedding, sign_j) / √16, signs from md5 parity (see
    // [[projSigns]]). The scale path for every downstream similarity op:
    // a 4× narrower vector with pairwise distances preserved within
    // JL distortion, computed as 16 codegen'd FloatVecDot kernels over
    // plan-literal sign vectors — zero shuffle, zero allocation per row,
    // column-pruned scan. At 100 TB this runs as a pure narrow map at
    // scan speed; the projection matrix never leaves the plan.
    NamedQuery(
      "embedding_random_projection",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val scale = math.sqrt(ProjDims.toDouble)
        val outs = (0 until ProjDims).map { j =>
          r6(vecDot(col("embedding"), typedLit(projSigns(j))) / lit(scale))
            .as(s"p$j")
        }
        e.select(col("vec_id") +: outs: _*).orderBy(col("vec_id"))
      },
      Some {
        val scale = math.sqrt(ProjDims.toDouble)
        val outs = (0 until ProjDims).map { j =>
          val dot = s"(SELECT SUM(CAST(embedding[i] AS DOUBLE) * ${projSignSql(j)}) " +
            s"FROM generate_series(1,$SrcDims) t(i))"
          s"${r6Sql(s"$dot / $scale")} AS p$j"
        }
        s"""SELECT vec_id,
           |  ${outs.mkString(",\n  ")}
           |FROM embeddings ORDER BY vec_id""".stripMargin
      }),

    // Ordered-step funnel over the events stream: per user, the first
    // 'view', the first 'click' strictly AFTER that view, the first
    // 'purchase' strictly after that click; rolled up by the view-day
    // cohort with per-step conversion rates. All three step times are
    // min-over-partition window aggregates chained on ONE user_id
    // partitioning — a single exchange feeds three Window passes and the
    // distinct, so at 100 TB the plan is one shuffle of (user_id, type,
    // ts) plus a tiny per-day rollup (the classic sessionization-family
    // shape; no self-joins, no per-step passes over the raw events).
    NamedQuery(
      "events_funnel_steps",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        val per = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") > col("t_view"),
              col("ts"))).over(w))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
              col("ts"))).over(w))
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
          .distinct()
          .filter(col("t_view").isNotNull)
        per.groupBy(date_trunc("day", col("t_view")).cast("date").as("cohort_date"))
          .agg(count(lit(1)).as("n_entered"),
            count(col("t_click")).as("n_clicked"),
            count(col("t_purchase")).as("n_purchased"))
          .withColumn("click_rate",
            r6(col("n_clicked").cast("double") / col("n_entered")))
          .withColumn("purchase_rate",
            r6(col("n_purchased").cast("double") / col("n_entered")))
          .orderBy(col("cohort_date"))
      },
      Some(s"""WITH e1 AS (
              |  SELECT user_id, event_type, ts,
              |    MIN(CASE WHEN event_type = 'view' THEN ts END)
              |      OVER (PARTITION BY user_id) AS t_view
              |  FROM events
              |), e2 AS (
              |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view
              |      THEN ts END) OVER (PARTITION BY user_id) AS t_click
              |  FROM e1
              |), e3 AS (
              |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
              |      THEN ts END) OVER (PARTITION BY user_id) AS t_purchase
              |  FROM e2
              |), per AS (
              |  SELECT DISTINCT user_id, t_view, t_click, t_purchase
              |  FROM e3 WHERE t_view IS NOT NULL
              |)
              |SELECT CAST(date_trunc('day', t_view) AS DATE) AS cohort_date,
              |  CAST(COUNT(*) AS BIGINT) AS n_entered,
              |  CAST(COUNT(t_click) AS BIGINT) AS n_clicked,
              |  CAST(COUNT(t_purchase) AS BIGINT) AS n_purchased,
              |  ${r6Sql("CAST(COUNT(t_click) AS DOUBLE) / COUNT(*)")} AS click_rate,
              |  ${r6Sql("CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(*)")}
              |    AS purchase_rate
              |FROM per GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weekly cohort retention: users grouped by the ISO week of their
    // FIRST event (any type), counted in every later week they are
    // active, with per-offset retention against the cohort's own size
    // (= its week-0 count, by construction). Same single-exchange shape
    // as the funnel: the first-event time is a min-over-partition window
    // on user_id, the (user, cohort, week) de-dup and the rollup reuse
    // that one shuffle, and the cohort size joins back as a window max
    // over the tiny per-(cohort, offset) aggregate — at 100 TB one
    // exchange of (user_id, ts) plus a rollup of cohorts×offsets rows.
    NamedQuery(
      "events_retention_weekly",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        val weeks = Tables.events(s, d)
          .select(col("user_id"), col("ts"))
          .withColumn("first_ts", min(col("ts")).over(w))
          .select(col("user_id"),
            date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
            date_trunc("week", col("ts")).cast("date").as("act_week"))
          .distinct()
        val counts = weeks
          .groupBy(col("cohort_week"),
            (datediff(col("act_week"), col("cohort_week")) / 7)
              .cast("long").as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
        counts
          .withColumn("cohort_size",
            max(when(col("week_offset") === 0L, col("n_active"))).over(
              Window.partitionBy(col("cohort_week"))))
          .withColumn("retention",
            r6(col("n_active").cast("double") / col("cohort_size")))
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"), col("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some(s"""WITH f AS (
              |  SELECT user_id, ts,
              |    MIN(ts) OVER (PARTITION BY user_id) AS first_ts
              |  FROM events
              |), a AS (
              |  SELECT DISTINCT user_id,
              |    CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
              |    CAST(date_trunc('week', ts) AS DATE) AS act_week
              |  FROM f
              |), c AS (
              |  SELECT cohort_week,
              |    CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT)
              |      AS week_offset,
              |    CAST(COUNT(*) AS BIGINT) AS n_active
              |  FROM a GROUP BY 1, 2
              |)
              |SELECT cohort_week, week_offset, n_active,
              |  MAX(CASE WHEN week_offset = 0 THEN n_active END)
              |    OVER (PARTITION BY cohort_week) AS cohort_size,
              |  ${r6Sql("CAST(n_active AS DOUBLE) / (MAX(CASE WHEN week_offset = 0 " +
                 "THEN n_active END) OVER (PARTITION BY cohort_week))")} AS retention
              |FROM c ORDER BY cohort_week, week_offset""".stripMargin)),

    // Bigram language-model surprise — the CCNet/Wikipedia-LM curation
    // idea (Wenzek et al. 2020, arXiv:1911.00359): train an add-one
    // smoothed bigram model ON the corpus, score every document by its
    // mean per-bigram surprise −ln p(w2|w1) = ln((c(w1)+V)/(c(w1,w2)+1)),
    // and surface the 20 most improbable documents — the statistical
    // outlier detector that length/stopword heuristics miss. At 100 TB
    // the LM tables are the shuffled artifacts (unigram counts, bigram
    // counts — both vocabulary-bounded, far smaller than the corpus) and
    // scoring is ONE equi-join of the doc bigram stream against the
    // scored bigram table plus a per-doc average: the canonical
    // score-corpus-against-LM shape. ln() differs by ≤1 ulp between
    // libm implementations; the r6-rounded mean absorbs it (the
    // text_zipf_fit precedent).
    NamedQuery(
      "text_bigram_surprise",
      (s, d) => {
        val w = MLQueries.words(s, d)
        val toks = w.select(col("doc_id"), explode(col("w")).as("word"))
        val uni = toks.groupBy(col("word")).agg(count(lit(1)).as("c1"))
        val vocab = uni.agg(count(lit(1)).as("v"))
        val bigr = w.select(col("doc_id"), explode(expr(
            "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2), " +
              "i -> struct(w[i] AS w1, w[i+1] AS w2)) ELSE array() END"))
            .as("bg"))
          .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val bic = bigr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        val scoredBigrams = bic
          .join(uni.withColumnRenamed("word", "w1"), "w1")
          .crossJoin(broadcast(vocab))
          .withColumn("surprise",
            log((col("c1") + col("v")).cast("double") / (col("cb") + lit(1L))))
          .select(col("w1"), col("w2"), col("surprise"))
        bigr.join(scoredBigrams, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            avg(col("surprise")).as("raw"))
          .withColumn("avg_surprise", r6(col("raw")))
          .select(col("doc_id"), col("n_bigrams"), col("avg_surprise"))
          .orderBy(col("avg_surprise").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH wrds AS (
              |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
              |), toks AS (
              |  SELECT doc_id, UNNEST(w) AS word FROM wrds
              |), uni AS (
              |  SELECT word, CAST(COUNT(*) AS BIGINT) AS c1 FROM toks GROUP BY 1
              |), vocab AS (
              |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni
              |), bigr AS (
              |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
              |  FROM wrds, LATERAL (SELECT UNNEST(generate_series(1,
              |    len(w) - 1)) AS i) t
              |  WHERE len(w) >= 2
              |), bic AS (
              |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
              |  FROM bigr GROUP BY 1, 2
              |), scored AS (
              |  SELECT b.doc_id,
              |    ln(CAST(u.c1 + v.v AS DOUBLE) / (c.cb + 1)) AS surprise
              |  FROM bigr b
              |  JOIN bic c USING (w1, w2)
              |  JOIN uni u ON u.word = b.w1
              |  CROSS JOIN vocab v
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              |  ${r6Sql("AVG(surprise)")} AS avg_surprise
              |FROM scored GROUP BY 1
              |ORDER BY avg_surprise DESC, doc_id LIMIT 20""".stripMargin)),

    // Audio feature extraction over the REAL WAV decode path: per
    // (doc, channel), exact integer energy (Σv²) and the zero-crossing
    // count between consecutive frames — the decode → feature-extract
    // stage of a multimodal pipeline, downstream of multimodal_decode_wav
    // and sharing its one validated chunk walk (Multimodal.findWavPcm).
    // Narrow mapPartitions over ids, payloads never leave the task that
    // synthesized them; the oracle replays the synthesis formulas
    // analytically with a LAG window per channel — integer-exact.
    NamedQuery(
      "multimodal_audio_features",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions { ids =>
            ids.flatMap { id =>
              val stats = graft.ml.Multimodal
                .wavChannelStats(graft.ml.Multimodal.synthWav(id))
                .getOrElse(throw new IllegalStateException(
                  s"synthesized WAV for doc $id failed to decode"))
              stats.map { case (c, nf, sq, zc) => (id, c.toLong, nf, sq, zc) }
            }
          }
          .toDF("doc_id", "channel", "n_frames", "sum_sq", "zero_crossings")
          .orderBy(col("doc_id"), col("channel"))
      },
      Some("""WITH params AS (
             |  SELECT doc_id,
             |    1 + doc_id % 2 AS n_channels,
             |    100 + doc_id % 400 AS n_frames
             |  FROM documents
             |), samples AS (
             |  SELECT p.doc_id, u.c AS channel, t.i AS frame,
             |    ((p.doc_id * 131 + t.i * 7 + u.c * 13) % 65536) - 32768 AS v
             |  FROM params p
             |  JOIN (SELECT UNNEST(generate_series(0, 499)) AS i) t
             |    ON t.i < p.n_frames
             |  JOIN (SELECT UNNEST(generate_series(0, 1)) AS c) u
             |    ON u.c < p.n_channels
             |), lagged AS (
             |  SELECT doc_id, channel, v, LAG(v) OVER (
             |    PARTITION BY doc_id, channel ORDER BY frame) AS pv
             |  FROM samples
             |)
             |SELECT doc_id, CAST(channel AS BIGINT) AS channel,
             |  CAST(COUNT(*) AS BIGINT) AS n_frames,
             |  CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
             |  CAST(SUM(CASE WHEN pv IS NOT NULL
             |    AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS zero_crossings
             |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Product quantization encode (Jégou et al. 2011, "Product
    // Quantization for Nearest Neighbor Search"): every vector compressed
    // to 4 codeword ids (one byte each at k=8) + its micro-unit
    // quantization error. The 4× step beyond embedding_quantize_int8: at
    // 100 TB the float vectors (256 B each) stay in cold storage and the
    // similarity working set is the 4-byte codes — the standard
    // billion-scale ANN memory layout. Encode is a pure narrow map: 8
    // codegen'd FloatVecDot kernels per (row, subspace) against
    // plan-literal codebooks, no join, no shuffle (codebooks reuse the
    // registry's vec_id < 8 seed contract, k ≪ N exactly like the IVF
    // centroids).
    NamedQuery(
      "similarity_pq_encode",
      (s, d) => pqCodes(s, d).orderBy(col("vec_id")),
      Some(s"""WITH $pqCodesSql
              |SELECT vec_id,
              |  ${(0 until NSub).map(sub =>
                  s"MIN(CASE WHEN sub = $sub THEN code END) AS c$sub")
                  .mkString(",\n  ")},
              |  CAST(SUM(err_micro_sub) AS BIGINT) AS err_micro
              |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // The fused per-subspace encode judged at PRODUCTION k* (round 19 —
    // the r18 verdict's ask: ann_assign_fused_k1024's recipe applied per
    // subspace). NearestCodeword exists because the per-codeword column
    // fan-out cannot PLAN at the k* = 256 an 8-bit PQ code ships, yet the
    // largest judged k* was 16 — this gate proves the fused encode
    // builds, stays codegen'd, and encodes oracle-exactly at the
    // production shape. The codebook is 256 synthetic codewords per
    // subspace on the exact 1/4096 float grid — dim gi of codeword c is
    // ((gi·(c+7)·2654435761) mod 2048 − 1024)/4096 with gi the GLOBAL
    // 1-based dim (so the four subspace codebooks differ); the ±0.25
    // range matches the corpus' per-element scale, so the argmin
    // genuinely spreads over the codebook instead of collapsing to the
    // min-bias codeword (measured: a ±1 grid left subspaces 1-3 on 2-4
    // codewords; at ±0.25 every subspace uses 150+ of its 256 at
    // sf0.01). Every
    // value is exactly FLOAT-representable, so the ‖cb‖² bias is EXACT in double
    // under ANY summation order (the k1024 gate's provably-safe
    // unordered-SUM construction); the slice dot stays an order-fixed
    // float→double fold in both engines. Judged output is the per
    // (subspace, codeword) census + member id-checksum, which pins all
    // four encode argmins of every vector. Driver state is 4×256×16
    // floats (~64 KB — the k ≪ N bound); the scan is FOUR one-node fused
    // argmins, join-free (PlanShapeSpec) with codegen pinned active at
    // k*=256 (VectorOpsSpec).
    NamedQuery(
      "ann_encode_fused_k256",
      (s, d) => {
        val kStar = 256
        def block(sub: Int, c: Long): Array[Float] = Array.tabulate(SubDim) { i0 =>
          val gi = (sub * SubDim + i0 + 1).toLong
          (((gi * (c + 7L) * 2654435761L) % 2048L - 1024L).toDouble / 4096.0).toFloat
        }
        val ids: Seq[Long] = (0L until kStar.toLong).toSeq
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val coded = (0 until NSub).foldLeft(e) { (df, sub) =>
          val blocks = ids.map(c => block(sub, c))
          df.withColumn(s"c$sub", graft.functions.VectorOps.nearestCodeword(
            col("embedding"), sub * SubDim, SubDim, ids, blocks,
            blocks.map(sq), returnScore = false))
        }
        coded.select(col("vec_id"),
            expr(s"stack($NSub, ${(0 until NSub).map(sub =>
              s"CAST($sub AS BIGINT), c$sub").mkString(", ")}) AS (sub, code)"))
          .groupBy(col("sub"), col("code"))
          .agg(count(lit(1)).as("n_members"),
            (sum(col("vec_id") % lit(2147483647L)) % lit(2147483647L))
              .as("id_checksum"))
          .orderBy(col("sub"), col("code"))
      },
      Some(s"""WITH cw AS (
              |  SELECT sub.s AS sub, c.c AS code, i.i AS dim,
              |    CAST((CAST((sub.s * $SubDim + i.i) * (c.c + 7) AS BIGINT)
              |      * 2654435761) % 2048 - 1024 AS DOUBLE) / 4096.0 AS v
              |  FROM (SELECT UNNEST(generate_series(0, ${NSub - 1})) AS s) sub
              |  CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS c) c
              |  CROSS JOIN (SELECT UNNEST(generate_series(1, $SubDim)) AS i) i
              |), cvec AS (
              |  SELECT sub, code, list(v ORDER BY dim) AS cv, SUM(v*v) AS bias
              |  FROM cw GROUP BY sub, code
              |), scores AS (
              |  SELECT e.vec_id, c.sub, c.code,
              |    FLOOR((c.bias - 2.0 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
              |      list_transform(generate_series(1, $SubDim), i ->
              |        CAST(e.embedding[c.sub * $SubDim + i] AS DOUBLE) * c.cv[i])),
              |      (acc, x) -> acc + x)) * 1000000.0 + 0.5) / 1000000.0 AS score
              |  FROM embeddings e CROSS JOIN cvec c
              |), enc AS (
              |  SELECT vec_id, sub, code FROM (
              |    SELECT vec_id, sub, code, ROW_NUMBER() OVER (
              |      PARTITION BY vec_id, sub ORDER BY score ASC, code) AS rn
              |    FROM scores) WHERE rn = 1
              |)
              |SELECT CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
              |  CAST(COUNT(*) AS BIGINT) AS n_members,
              |  CAST(SUM(vec_id % 2147483647) % 2147483647 AS BIGINT) AS id_checksum
              |FROM enc GROUP BY sub, code ORDER BY sub, code""".stripMargin)),

    // Asymmetric-distance (ADC) top-k over the PQ codes: per query, the
    // 4×8 lookup table of exact-query-sub-block-to-codeword squared
    // distances is precomputed on the DRIVER in micro-units and embedded
    // as a plan literal; the database side contributes ONLY its codes —
    // approx dist = Σ_sub LUT[q][sub][code], four integer array lookups
    // per (query, vector) pair, integer-exact in both engines. This is
    // the PQ promise made literal: the scan that ranks 100 TB of vectors
    // for a query reads 4-byte codes and never touches a float vector.
    // Top-5 per query by (approx_micro, neighbor_id) — the deterministic
    // ranking contract of the similarity family.
    NamedQuery(
      "similarity_pq_adc_topk",
      (s, d) => pqAdcRanked(s, d)
        .filter(col("rank") <= 5)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $pqAdcRankedSql
              |SELECT query_id, neighbor_id, rank, approx_micro
              |FROM adc WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // PQ recall calibration: recall@5 of the ADC ranking (the EXACT
    // ranking the search gate ships — ONE shared pqAdcRanked definition)
    // against the exact full-precision L2² top-5 on the same queries —
    // the measurement run before trusting a quantized index at scale,
    // the similarity_recall_calibration sibling for the PQ family. Exact
    // distances use the micro-unit expansion ‖q‖² − 2q·x + ‖x‖² with
    // driver-fold ‖q‖² and the FloatVecDot kernel, so both engines see
    // the same integers; the exact side is bounded to the 5-query sample
    // (crossJoin is the measurement baseline, by design — at 100 TB the
    // sample stays fixed while the index side scales).
    NamedQuery(
      "similarity_pq_recall",
      (s, d) => pqRecallAgainstExact(s, d,
        pqAdcRanked(s, d).filter(col("rank") <= 5)),
      Some {
        val gs64 = s"generate_series(1, $SrcDims) t(i)"
        s"""WITH $pqAdcRankedSql, xs AS (
           |  SELECT vec_id, (SELECT SUM(CAST(embedding[i] AS DOUBLE)
           |    * CAST(embedding[i] AS DOUBLE)) FROM $gs64) AS xx
           |  FROM embeddings WHERE vec_id >= 5
           |), qs AS (
           |  SELECT vec_id, (SELECT SUM(CAST(embedding[i] AS DOUBLE)
           |    * CAST(embedding[i] AS DOUBLE)) FROM $gs64) AS qq
           |  FROM embeddings WHERE vec_id < 5
           |), exd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
           |    CAST(FLOOR((qs.qq - 2 * (SELECT SUM(CAST(q.embedding[i] AS DOUBLE)
           |      * CAST(x.embedding[i] AS DOUBLE)) FROM $gs64) + xs.xx)
           |      * 1000000.0 + 0.5) AS BIGINT) AS exact_micro
           |  FROM embeddings q JOIN embeddings x ON x.vec_id >= 5
           |  JOIN qs ON qs.vec_id = q.vec_id
           |  JOIN xs ON xs.vec_id = x.vec_id
           |  WHERE q.vec_id < 5
           |), ex AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
           |      PARTITION BY query_id ORDER BY exact_micro, neighbor_id) AS rn
           |    FROM exd
           |  ) WHERE rn <= 5
           |)
           |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  ${r6Sql("CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)")} AS recall
           |FROM ex e LEFT JOIN (SELECT query_id, neighbor_id FROM adc
           |  WHERE rank <= 5) a
           |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Trained PQ codebook judged end-to-end (round 15, the r14 verdict's
    // lead item — recall@5 of 0.0-0.4 said the k=8 sampled codebook is a
    // correctness stand-in, not an index-grade quantizer): run the
    // per-subspace Lloyd training (pqTrainedDetailed — k=16 codewords per
    // 16-dim subspace, one assign+update round from the vec_id < 16 seed
    // sub-blocks) and emit, per (sub, code), the member census plus
    // micro-unit integer checksums pinning every trained coordinate. The
    // oracle unrolls the round in SQL exactly like ann_build_two_rounds:
    // seed assignment (argmin of the judged encode score, lowest-position
    // ties), micro-unit integer means stored float32, empty codewords
    // carrying their raw seed floats. Any drift in the loop — seed
    // choice, tie-break, mean rounding, float storage, carry-over —
    // breaks the hash.
    NamedQuery(
      "similarity_pq_trained",
      (s, d) => {
        import s.implicits._
        val t = pqTrainedDetailed(s, d)
        (for { sub <- 0 until NSub; c <- 0 until PqTrainK } yield {
          val q = t.codebook(sub)(c).map(x =>
            math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
          (sub.toLong, c.toLong, t.census.getOrElse((sub, c), 0L),
            q.map(x => x * x).sum,
            q.zipWithIndex.map { case (x, i) =>
              ((x + 1000000L) % 2147483647L) * (i + 1L)
            }.sum % 2147483647L)
        }).toDF("sub", "code", "n_assigned", "norm2_micro", "centroid_checksum")
          .orderBy(col("sub"), col("code"))
      },
      Some(s"""WITH $pqTrainSql, tq AS (
              |  SELECT sub, code, dim,
              |    CAST(FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS q
              |  FROM tcent
              |)
              |SELECT CAST(t.sub AS BIGINT) AS sub, CAST(t.code AS BIGINT) AS code,
              |  CAST(COALESCE(cs.n, 0) AS BIGINT) AS n_assigned,
              |  CAST(SUM(q * q) AS BIGINT) AS norm2_micro,
              |  CAST(SUM(((q + 1000000) % 2147483647) * dim) % 2147483647 AS BIGINT)
              |    AS centroid_checksum
              |FROM tq t LEFT JOIN tcensus cs ON cs.sub = t.sub AND cs.code = t.code
              |GROUP BY t.sub, t.code, cs.n ORDER BY sub, code""".stripMargin)),

    // Recall@5 of the TRAINED index — the measured payoff of training,
    // judged next to the sampled-codebook baseline (ONE shared
    // pqRecallAgainstExact tail and ONE pqAdcRankedWith ranking, so the
    // two numbers differ only in the codebook): encode the database
    // vectors with the trained codewords, rank by the trained ADC LUT,
    // compare against the same exact top-5. The oracle replays the full
    // chain — trained codebook (pqTrainSql), trained encode, per-query
    // LUT, ADC ranking, exact side. Measured on the fixture: the k=8
    // sampled baseline sits at 0.0-0.4; this gate pins the trained
    // number (see SCALE.md) — the calibration-next-to-the-index family
    // rule applied to the quantizer that would actually ship.
    NamedQuery(
      "similarity_pq_recall_trained",
      (s, d) => pqRecallAgainstExact(s, d,
        pqAdcRankedWith(s, d, pqTrainedAsSeq(pqTrainedDetailed(s, d)))
          .filter(col("rank") <= 5)),
      Some {
        val gs64 = s"generate_series(1, $SrcDims) t(i)"
        s"""WITH $pqTrainSql, tdsc AS (
           |  SELECT e.vec_id, c.sub, c.code,
           |    ${r6Sql("SUM(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)) - 2 * " +
                s"SUM(CAST(e.embedding[c.sub * $SubDim + c.dim] AS DOUBLE) * CAST(c.v AS DOUBLE))")} AS score
           |  FROM embeddings e CROSS JOIN tcent c
           |  GROUP BY 1, 2, 3
           |), tdcodes AS (
           |  SELECT vec_id, sub, code FROM (
           |    SELECT vec_id, sub, code, ROW_NUMBER() OVER (
           |      PARTITION BY vec_id, sub ORDER BY score ASC, code) AS rn
           |    FROM tdsc
           |  ) WHERE rn = 1
           |), tlut AS (
           |  SELECT q.vec_id AS query_id, c.sub, c.code,
           |    CAST(FLOOR(SUM(
           |      (CAST(q.embedding[c.sub * $SubDim + c.dim] AS DOUBLE) - CAST(c.v AS DOUBLE))
           |      * (CAST(q.embedding[c.sub * $SubDim + c.dim] AS DOUBLE) - CAST(c.v AS DOUBLE)))
           |      * 1000000.0 + 0.5) AS BIGINT) AS dmicro
           |  FROM embeddings q CROSS JOIN tcent c
           |  WHERE q.vec_id < 5
           |  GROUP BY 1, 2, 3
           |), tapprox AS (
           |  SELECT l.query_id, cd.vec_id AS neighbor_id,
           |    CAST(SUM(l.dmicro) AS BIGINT) AS approx_micro
           |  FROM tdcodes cd JOIN tlut l ON l.sub = cd.sub AND l.code = cd.code
           |  WHERE cd.vec_id >= 5 GROUP BY 1, 2
           |), tadc AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
           |      PARTITION BY query_id ORDER BY approx_micro, neighbor_id) AS rnk
           |    FROM tapprox
           |  ) WHERE rnk <= 5
           |), xs AS (
           |  SELECT vec_id, (SELECT SUM(CAST(embedding[i] AS DOUBLE)
           |    * CAST(embedding[i] AS DOUBLE)) FROM $gs64) AS xx
           |  FROM embeddings WHERE vec_id >= 5
           |), qs AS (
           |  SELECT vec_id, (SELECT SUM(CAST(embedding[i] AS DOUBLE)
           |    * CAST(embedding[i] AS DOUBLE)) FROM $gs64) AS qq
           |  FROM embeddings WHERE vec_id < 5
           |), exd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
           |    CAST(FLOOR((qs.qq - 2 * (SELECT SUM(CAST(q.embedding[i] AS DOUBLE)
           |      * CAST(x.embedding[i] AS DOUBLE)) FROM $gs64) + xs.xx)
           |      * 1000000.0 + 0.5) AS BIGINT) AS exact_micro
           |  FROM embeddings q JOIN embeddings x ON x.vec_id >= 5
           |  JOIN qs ON qs.vec_id = q.vec_id
           |  JOIN xs ON xs.vec_id = x.vec_id
           |  WHERE q.vec_id < 5
           |), ex AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
           |      PARTITION BY query_id ORDER BY exact_micro, neighbor_id) AS rn
           |    FROM exd
           |  ) WHERE rn <= 5
           |)
           |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  ${r6Sql("CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)")} AS recall
           |FROM ex e LEFT JOIN tadc a
           |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Thumbnail downsample over the REAL PPM decode path: each image
    // reduced to a 2×2 grid of block-mean cells, kept as exact integer
    // (channel sums, pixel count) numerators — the decode → resize stage
    // of the image pipeline, sharing the one validated header parse
    // (Multimodal.findPpmRaster) with multimodal_decode_ppm. Pixel
    // (x, y) maps to cell (y·2 div h, x·2 div w) — pure integer
    // arithmetic the oracle replays from the synthesis formulas. Narrow
    // mapPartitions; payloads never leave the task.
    NamedQuery(
      "multimodal_thumbnail_grid",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions { ids =>
            ids.flatMap { id =>
              val cells = graft.ml.Multimodal
                .ppmGridStats(graft.ml.Multimodal.synthPpm(id), grid = 2)
                .getOrElse(throw new IllegalStateException(
                  s"synthesized PPM for doc $id failed to decode"))
              cells.map { case (cy, cx, r, g, b, n) =>
                (id, cy.toLong, cx.toLong, r, g, b, n)
              }
            }
          }
          .toDF("doc_id", "cell_y", "cell_x", "r_sum", "g_sum", "b_sum", "n_px")
          .orderBy(col("doc_id"), col("cell_y"), col("cell_x"))
      },
      Some("""WITH params AS (
             |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
             |  FROM documents
             |), px AS (
             |  SELECT p.doc_id,
             |    (y.y * 2) // p.h AS cell_y, (x.x * 2) // p.w AS cell_x,
             |    (p.doc_id * 37 + (y.y * p.w + x.x) * 5 + 0) % 256 AS r,
             |    (p.doc_id * 37 + (y.y * p.w + x.x) * 5 + 11) % 256 AS g,
             |    (p.doc_id * 37 + (y.y * p.w + x.x) * 5 + 22) % 256 AS b
             |  FROM params p
             |  JOIN (SELECT UNNEST(generate_series(0, 8)) AS y) y ON y.y < p.h
             |  JOIN (SELECT UNNEST(generate_series(0, 16)) AS x) x ON x.x < p.w
             |)
             |SELECT doc_id, CAST(cell_y AS BIGINT) AS cell_y,
             |  CAST(cell_x AS BIGINT) AS cell_x,
             |  CAST(SUM(r) AS BIGINT) AS r_sum,
             |  CAST(SUM(g) AS BIGINT) AS g_sum,
             |  CAST(SUM(b) AS BIGINT) AS b_sum,
             |  CAST(COUNT(*) AS BIGINT) AS n_px
             |FROM px GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // IVF-PQ composed search (the production billion-scale ANN layout,
    // Jégou et al. 2011 §IV): the coarse quantizer restricts the probe
    // to the query's IVF cell, the fine quantizer (PQ codes + ADC LUT)
    // ranks within it. Composes the TWO judged index definitions
    // verbatim — MLQueries.ivfAssigned for cells (query cells read off
    // the same definition, a 5-row bounded collect: at scale, cell
    // assignment for a query batch is k driver dots), pqCodes + the
    // shared pqAdcLut for ranking — so this gate searches exactly the
    // index the ivf and pq gates each verified. Candidates in cells no
    // query probes are dropped by an empty-array explode (zero work,
    // the IVF promise); approx dist stays 4 integer lookups per
    // surviving pair. At 100 TB the codes table is STORED partitioned
    // by cell (the vec_id join here re-derives what an index build
    // writes once), so a probe reads one cell's partitions and never
    // touches a float vector.
    NamedQuery(
      "similarity_ann_ivfpq",
      (s, d) => {
        val cb = pqCodebook(s, d)
        val queries = pqQueries(s, d)
        val lutCol = typedLit(pqAdcLut(queries, cb))
        val qids = queries.map(_._1)
        val cells = MLQueries.ivfAssigned(s, d).select(col("vec_id"), col("cell"))
        // query → cell from the ONE judged assignment definition (5 rows)
        val qcell = cells.filter(col("vec_id") < 5).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val cellToQix: Array[Array[Int]] = Array.tabulate(PqK)(c =>
          qids.indices.collect { case i if qcell(qids(i)) == c => i + 1 }.toArray)
        pqCodes(s, d, Some(cb)).filter(col("vec_id") >= 5)
          .join(cells, "vec_id")
          .withColumn("qix",
            explode(element_at(typedLit(cellToQix), (col("cell") + 1).cast("int"))))
          .withColumn("query_id", element_at(typedLit(qids.toArray), col("qix")))
          .withColumn("approx_micro", adcApproxCol(lutCol))
          .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("approx_micro"), col("vec_id"))))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("rank").cast("long").as("rank"), col("approx_micro"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $pqAdcRankedSql, ${MLQueries.ivfAssignSql}
              |SELECT query_id, neighbor_id, rank, approx_micro FROM (
              |  SELECT a.query_id, a.neighbor_id, a.approx_micro,
              |    CAST(ROW_NUMBER() OVER (PARTITION BY a.query_id
              |      ORDER BY a.approx_micro, a.neighbor_id) AS BIGINT) AS rank
              |  FROM approx a
              |  JOIN assigned qa ON qa.vec_id = a.query_id
              |  JOIN assigned nb ON nb.vec_id = a.neighbor_id
              |    AND nb.cell = qa.cell
              |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // The composed IVF-PQ probe at nprobe=2 (round 19 — completing the
    // multi-probe lever across the ANN family): the coarse restriction
    // widens to each query's TOP-2 cells (the judged ivfProbed
    // definition — rank-0 identical to similarity_ann_ivfpq's one-cell
    // restriction), the fine ranking stays the judged integer ADC over
    // the SAME plan-literal LUT, and candidates remain 4-byte codes —
    // at 100 TB the knob buys back coarse-boundary recall for ~2× the
    // candidate code reads per query, with zero extra float-vector I/O.
    // Pairs stay unique (a candidate lives in exactly one cell). Plan:
    // the same codes-side narrow map + tiny per-cell query fan-out
    // (driver state: 5 queries × 2 cells), top-5 per query.
    NamedQuery(
      "similarity_ann_ivfpq_nprobe2",
      (s, d) => {
        val cb = pqCodebook(s, d)
        val queries = pqQueries(s, d)
        val lutCol = typedLit(pqAdcLut(queries, cb))
        val qids = queries.map(_._1)
        // query → its top-2 cells from the ONE judged multi-probe
        // definition (≤ 10 driver rows)
        val qcells = MLQueries.ivfProbed(s, d, 2)
          .filter(col("vec_id") < 5).select(col("vec_id"), col("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val cells = MLQueries.ivfAssigned(s, d).select(col("vec_id"), col("cell"))
        val cellToQix: Array[Array[Int]] = Array.tabulate(PqK)(c =>
          qids.indices.collect {
            case i if qcells((qids(i), c.toLong)) => i + 1
          }.toArray)
        pqCodes(s, d, Some(cb)).filter(col("vec_id") >= 5)
          .join(cells, "vec_id")
          .withColumn("qix",
            explode(element_at(typedLit(cellToQix), (col("cell") + 1).cast("int"))))
          .withColumn("query_id", element_at(typedLit(qids.toArray), col("qix")))
          .withColumn("approx_micro", adcApproxCol(lutCol))
          .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("approx_micro"), col("vec_id"))))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("rank").cast("long").as("rank"), col("approx_micro"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $pqAdcRankedSql, ${MLQueries.ivfAssignSql},
              |${MLQueries.ivfProbedSql(2)}
              |SELECT query_id, neighbor_id, rank, approx_micro FROM (
              |  SELECT a.query_id, a.neighbor_id, a.approx_micro,
              |    CAST(ROW_NUMBER() OVER (PARTITION BY a.query_id
              |      ORDER BY a.approx_micro, a.neighbor_id) AS BIGINT) AS rank
              |  FROM approx a
              |  JOIN probed qa ON qa.vec_id = a.query_id
              |  JOIN assigned nb ON nb.vec_id = a.neighbor_id
              |    AND nb.cell = qa.cell
              |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Audio decimation over the REAL PCM16 decode path: keep every 4th
    // frame and emit the DECIMATED stream's per-channel integer energy
    // and zero crossings — the decode → resample stage of the audio
    // pipeline (the WAV sibling of multimodal_thumbnail_grid), sharing
    // the one validated chunk walk (Multimodal.findWavPcm) with
    // multimodal_decode_wav / multimodal_audio_features. Narrow
    // mapPartitions; payloads never leave the task; the oracle replays
    // the synthesis formulas with a frame % 4 = 0 restriction.
    NamedQuery(
      "multimodal_audio_downsample",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions { ids =>
            ids.flatMap { id =>
              val stats = graft.ml.Multimodal
                .wavDecimatedStats(graft.ml.Multimodal.synthWav(id), every = 4)
                .getOrElse(throw new IllegalStateException(
                  s"synthesized WAV for doc $id failed to decode"))
              stats.map { case (c, nf, sq, zc) => (id, c.toLong, nf, sq, zc) }
            }
          }
          .toDF("doc_id", "channel", "n_frames_out", "sum_sq", "zero_crossings")
          .orderBy(col("doc_id"), col("channel"))
      },
      Some("""WITH params AS (
             |  SELECT doc_id,
             |    1 + doc_id % 2 AS n_channels,
             |    100 + doc_id % 400 AS n_frames
             |  FROM documents
             |), samples AS (
             |  SELECT p.doc_id, u.c AS channel, t.i AS frame,
             |    ((p.doc_id * 131 + t.i * 7 + u.c * 13) % 65536) - 32768 AS v
             |  FROM params p
             |  JOIN (SELECT UNNEST(generate_series(0, 499)) AS i) t
             |    ON t.i < p.n_frames AND t.i % 4 = 0
             |  JOIN (SELECT UNNEST(generate_series(0, 1)) AS c) u
             |    ON u.c < p.n_channels
             |), lagged AS (
             |  SELECT doc_id, channel, v, LAG(v) OVER (
             |    PARTITION BY doc_id, channel ORDER BY frame) AS pv
             |  FROM samples
             |)
             |SELECT doc_id, CAST(channel AS BIGINT) AS channel,
             |  CAST(COUNT(*) AS BIGINT) AS n_frames_out,
             |  CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
             |  CAST(SUM(CASE WHEN pv IS NOT NULL
             |    AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS zero_crossings
             |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Event-type Markov transition matrix: per user, consecutive event
    // pairs under a total (ts, event_id) order; counts and first-order
    // transition probabilities per (from, to) — the behavioral-sequence
    // statistic that prices an event-prediction dataset (and the event
    // sibling of text_bigram_surprise's LM counts). ONE user_id exchange
    // feeds the LAG window; the transition aggregate is |types|² rows.
    // Probabilities are r6 over integer counts — engine-exact.
    NamedQuery(
      "events_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
        tr.groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("n_from",
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
          .withColumn("p", r6(col("n").cast("double") / col("n_from")))
          .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
            col("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some(s"""WITH tr AS (
              |  SELECT user_id, event_type,
              |    LAG(event_type) OVER (PARTITION BY user_id
              |      ORDER BY epoch_us(ts), event_id) AS from_type
              |  FROM events
              |), cnt AS (
              |  SELECT from_type, event_type AS to_type,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM tr WHERE from_type IS NOT NULL
              |  GROUP BY 1, 2
              |)
              |SELECT from_type, to_type, n,
              |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
              |  ${r6Sql("CAST(n AS DOUBLE) / (SUM(n) OVER (PARTITION BY from_type))")}
              |    AS p
              |FROM cnt ORDER BY from_type, to_type""".stripMargin)),

    // Gopher-style rule filters (Rae et al. 2021, arXiv:2112.11446
    // §A1.1): the named per-rule quality flags a curation pipeline logs
    // BEFORE collapsing them into a keep decision — word-count band
    // [50, 1e5], mean word length in [3, 10], >= 2 distinct required
    // stopwords, >= 80% alphabetic words. Every rule is evaluated in
    // EXACT INTEGER form (3·n_words <= Σlen <= 10·n_words instead of a
    // float mean; 5·n_alpha >= 4·n_words instead of a ratio), so the
    // flag set cannot drift between engines. The paper's symbol/bullet/
    // ellipsis rules are degenerate on this corpus (no such glyphs) and
    // are deliberately omitted rather than shipped untestable. A pure
    // narrow map at scan speed — the word split is the registry's ONE
    // split-on-single-space spelling (MLQueries.words), with n_chars
    // riding along for the Σlen identity n_chars − (n_words − 1) (the
    // qualityScore precedent).
    NamedQuery(
      "text_gopher_rules",
      (s, d) => {
        val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        val base = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"), col("n_chars"))
          .withColumn("n_words", size(col("w")).cast("long"))
          .withColumn("sum_len", col("n_chars") - (col("n_words") - 1))
          .withColumn("n_alpha",
            expr("CAST(size(filter(w, x -> x rlike '^[A-Za-z]+$')) AS BIGINT)"))
          .withColumn("n_stop",
            stops.map(sw => when(array_contains(col("w"), sw), 1L).otherwise(0L))
              .reduce(_ + _))
        base.select(col("doc_id"), col("n_words"),
            (col("n_words") >= 50L && col("n_words") <= 100000L)
              .as("flag_word_count"),
            (lit(3L) * col("n_words") <= col("sum_len")
              && col("sum_len") <= lit(10L) * col("n_words"))
              .as("flag_mean_word_len"),
            (col("n_stop") >= 2L).as("flag_stopwords"),
            (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words"))
              .as("flag_alpha"))
          .withColumn("keep", col("flag_word_count")
            && col("flag_mean_word_len") && col("flag_stopwords")
            && col("flag_alpha"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stopSum = Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(sw => s"(CASE WHEN list_contains(w, '$sw') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH wrds AS (
           |  SELECT doc_id, string_split(text, ' ') AS w, n_chars
           |  FROM documents
           |), base AS (
           |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           |    n_chars - (CAST(len(w) AS BIGINT) - 1) AS sum_len,
           |    CAST(len(list_filter(w,
           |      x -> regexp_full_match(x, '[A-Za-z]+'))) AS BIGINT) AS n_alpha,
           |    $stopSum AS n_stop
           |  FROM wrds
           |)
           |SELECT doc_id, n_words,
           |  n_words >= 50 AND n_words <= 100000 AS flag_word_count,
           |  3 * n_words <= sum_len AND sum_len <= 10 * n_words
           |    AS flag_mean_word_len,
           |  n_stop >= 2 AS flag_stopwords,
           |  5 * n_alpha >= 4 * n_words AS flag_alpha,
           |  (n_words >= 50 AND n_words <= 100000)
           |    AND (3 * n_words <= sum_len AND sum_len <= 10 * n_words)
           |    AND n_stop >= 2
           |    AND (5 * n_alpha >= 4 * n_words) AS keep
           |FROM base ORDER BY doc_id""".stripMargin
      }),

    // Corpus distribution drift between two ingest cohorts (even- vs
    // odd-numbered sources): per-word symmetric-KL contributions over the
    // shared top-40 vocabulary with add-one smoothing. The standard
    // "did this crawl batch shift under me" monitor for a pretraining
    // corpus — text_zipf_fit alarms on SHAPE drift of the whole
    // frequency curve, this gate localizes WHICH words moved between two
    // cohorts. Plan: explode → (word)-keyed count with map-side combine
    // (one integer triple per word per partition) → TakeOrdered top-40
    // (never a global vocabulary sort) → one broadcast row of cohort
    // totals; at 100 TB the only wide op is the word-count agg, whose
    // reduce side is |vocab| rows. Counts stay integer to the division;
    // p's are r6-pinned before the log so the single ≤1-ulp ln
    // difference between libms is absorbed (the text_bigram_surprise
    // precedent).
    NamedQuery(
      "text_distribution_drift",
      (s, d) => {
        val grp = when(
          regexp_extract(col("source"), "([0-9]+)", 1).cast("long") % 2 === 0,
          lit("a")).otherwise(lit("b"))
        val wc = Tables.documents(s, d)
          .select(grp.as("grp"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("tot"),
            sum(when(col("grp") === "a", 1L).otherwise(0L)).as("cnt_a"),
            sum(when(col("grp") === "b", 1L).otherwise(0L)).as("cnt_b"))
        val top = wc.orderBy(col("tot").desc, col("word")).limit(40)
        val tots = top.agg(sum(col("cnt_a")).as("tot_a"),
          sum(col("cnt_b")).as("tot_b"))
        top.crossJoin(broadcast(tots))
          .withColumn("p_a",
            r6((col("cnt_a") + 1).cast("double") / (col("tot_a") + 40).cast("double")))
          .withColumn("p_b",
            r6((col("cnt_b") + 1).cast("double") / (col("tot_b") + 40).cast("double")))
          .withColumn("kl_term",
            r6((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b"))))
          .select(col("word"), col("cnt_a"), col("cnt_b"), col("p_a"),
            col("p_b"), col("kl_term"))
          .orderBy(col("word"))
      },
      Some(s"""WITH wg AS (
              |  SELECT CASE WHEN CAST(NULLIF(
              |      regexp_extract(source, '([0-9]+)', 1), '')
              |      AS BIGINT) % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
              |    UNNEST(string_split(text, ' ')) AS word
              |  FROM documents
              |), wc AS (
              |  SELECT word, CAST(COUNT(*) AS BIGINT) AS tot,
              |    CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT)
              |      AS cnt_a,
              |    CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT)
              |      AS cnt_b
              |  FROM wg GROUP BY 1
              |), top AS (
              |  SELECT * FROM wc ORDER BY tot DESC, word LIMIT 40
              |), tots AS (
              |  SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM top
              |), probs AS (
              |  SELECT word, cnt_a, cnt_b,
              |    ${r6Sql("CAST(cnt_a + 1 AS DOUBLE) / CAST(tot_a + 40 AS DOUBLE)")}
              |      AS p_a,
              |    ${r6Sql("CAST(cnt_b + 1 AS DOUBLE) / CAST(tot_b + 40 AS DOUBLE)")}
              |      AS p_b
              |  FROM top CROSS JOIN tots
              |)
              |SELECT word, cnt_a, cnt_b, p_a, p_b,
              |  ${r6Sql("(p_a - p_b) * ln(p_a / p_b)")} AS kl_term
              |FROM probs ORDER BY word""".stripMargin)),

    // Contrastive hard-example mining: for a bounded query sample
    // (vec_id % 100 = 0, i.e. k ≪ N by construction), the single nearest
    // SAME-label corpus vector (hardest positive) and nearest
    // OTHER-label vector (hardest negative) by the similarity family's
    // rounded-cosine contract. This is the retrieval-training data op
    // (DPR/contrastive fine-tuning mines exactly these pairs). Plan:
    // the bounded query side broadcasts into a nested-loop join, and the
    // winner per (query, kind) is a max over a (sim, -neighbor) struct —
    // a PARTIAL aggregate, so the q×N candidate stream combines map-side
    // and only |Q|·2 rows per partition ever shuffle (no window sort
    // over the cross product). Tie-break matches the oracle's
    // ROW_NUMBER(sim DESC, neighbor_id): max of -neighbor_id = lowest
    // id. At 100 TB the same mine runs per IVF cell
    // (similarity_ann_ivf's assignment) instead of corpus-wide; the
    // judged gate is the exact-mining contract that cell-local variant
    // must reproduce within its cells.
    NamedQuery(
      "similarity_hard_negatives",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), col("label"),
            vecNorm(col("embedding")).as("norm"))
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
            col("label").as("la"), col("norm").as("norm_a"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("eb"), col("label").as("lb"),
          col("norm").as("norm_b"))
        broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
          .withColumn("kind",
            when(col("lb") === col("la"), lit("pos")).otherwise(lit("neg")))
          .withColumn("sim",
            r6(vecDot(col("ea"), col("eb")) / (col("norm_a") * col("norm_b"))))
          .groupBy(col("query_id"), col("kind"))
          .agg(max(struct(col("sim"), (-col("neighbor_id")).as("tie"),
            col("neighbor_id"))).as("best"))
          .select(col("query_id"), col("kind"),
            col("best.neighbor_id").as("neighbor_id"),
            col("best.sim").as("sim"))
          .orderBy(col("query_id"), col("kind"))
      },
      Some(s"""WITH sims AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    CASE WHEN b.label = a.label THEN 'pos' ELSE 'neg' END
              |      AS kind,
              |    ${MLQueries.duckDot("a.embedding", "b.embedding")}
              |      / (${MLQueries.duckNorm("a.embedding")}
              |        * ${MLQueries.duckNorm("b.embedding")}) AS sim_raw
              |  FROM embeddings a JOIN embeddings b
              |    ON b.vec_id <> a.vec_id
              |  WHERE a.vec_id % 100 = 0
              |), ranked AS (
              |  SELECT query_id, kind, neighbor_id,
              |    ${r6Sql("sim_raw")} AS sim,
              |    ROW_NUMBER() OVER (PARTITION BY query_id, kind
              |      ORDER BY ${r6Sql("sim_raw")} DESC, neighbor_id) AS rn
              |  FROM sims
              |)
              |SELECT query_id, kind, neighbor_id, sim
              |FROM ranked WHERE rn = 1
              |ORDER BY query_id, kind""".stripMargin)),

    // Top principal component of the embedding covariance by 4-round
    // power iteration — the PCA leg every embedding pipeline runs
    // (whitening, energy checks, ABBA-style drift monitors). The 100 TB
    // shape is the k-means/IVF k ≪ N pattern taken to its limit: the
    // ONLY data-sized work is ONE narrow explode of each row into its
    // d(d+1)/2 = 2080 upper-triangle (i ≤ j) integer second-moment terms
    // plus d sentinel (j = 0) mean terms, all feeding a single
    // map-side-combining (i, j)-keyed sum whose COUNT doubles as the row
    // count — moments, means, and N from one pass, one shuffle of
    // ~2144·partitions rows (symmetry fills the mirror for free). That
    // aggregate is BOUNDED BY d² regardless of corpus size, so it
    // collects to the driver exactly like the k-means/IVF centroids, and
    // the covariance assembly plus all four power-iteration rounds are
    // driver loops over ~4096 longs — the first in-plan shape re-derived
    // the second-moment agg per iteration branch (9.3 s at sf0.1);
    // this one runs the distributed pass once. Cross-engine exactness is
    // the PQ gates' micro-unit discipline: elements pin to 1e-6 integers
    // up front, every sum is integer-exact and order-free (driver long
    // adds, BIGINT/HUGEINT in the oracle), and v re-pins to the 1e-6
    // grid after every normalize, so both engines walk the identical
    // integer lattice. The per-round norm crosses into double via an
    // EXPLICIT 2^47 split of the exact square sum — both pieces sit
    // under 2^53 (convert exactly), the 2^47 rescale is a power-of-two
    // (exact), and the single rounding is the final add, identical IEEE
    // in both engines. A direct HUGEINT→DOUBLE cast would NOT work:
    // DuckDB double-rounds it past 2^64 (verified on tie-boundary
    // probes), while BigInt.doubleValue rounds once. Sign pinned by
    // v[1] ≥ 0.
    NamedQuery(
      "embedding_pca_power",
      (s, d) => {
        val dim = 64
        // scan fan-out before the d(d+1)/2-term explode — the heaviest
        // map in the embedding family (r21 A/B at sf0.1: 1.93 s -> 0.79 s)
        val e = fanout(Tables.embeddings(s, d).select(col("embedding")))
        val xm = e.withColumn("xm", expr(microVecExpr))
        val terms = xm
          .select(col("xm"), posexplode(col("xm")).as(Seq("i0", "xi")))
          .select((col("i0") + 1).as("i"), posexplode(expr(
            s"concat(array(xi), transform(slice(xm, i0 + 1, $dim - i0), y -> xi * y))"))
            .as(Seq("jj", "p")))
          .select(col("i"),
            when(col("jj") === 0, lit(0)).otherwise(col("i") + col("jj") - 1)
              .as("j"),
            col("p"))
        val moments = terms.groupBy(col("i"), col("j"))
          .agg(sum(col("p")).as("sp"), count(lit(1)).as("cnt"))
        // bounded collect: ≤ d(d+3)/2 rows by construction, independent
        // of corpus size (the ivfAssigned / AnnIndex centroid contract)
        val sums = Array.ofDim[Long](dim + 1, dim + 1)
        val mm = Array.ofDim[Long](dim + 1)
        var n = 0.0
        moments.collect().foreach { r =>
          val (i, j, sp) = (r.getInt(0), r.getInt(1), r.getLong(2))
          if (j == 0) { mm(i) = sp; n = r.getLong(3).toDouble }
          else { sums(i)(j) = sp; sums(j)(i) = sp }
        }
        // covariance on the driver, in the ORACLE's exact double-op
        // order: sp/1e12/n - (ma/1e6/n)*(mb/1e6/n), then the 1e-6 pin
        val cm = Array.ofDim[Long](dim + 1, dim + 1)
        for (i <- 1 to dim; j <- 1 to dim)
          cm(i)(j) = math.floor((sums(i)(j).toDouble / 1e12 / n
            - (mm(i).toDouble / 1e6 / n) * (mm(j).toDouble / 1e6 / n))
            * 1000000.0 + 0.5).toLong
        var vm = Array.fill(dim)(125000L)
        var nrm = 0.0
        for (_ <- 1 to 4) {
          // exact long matvec (|cm·vm| ≤ 1e12, ×64 terms < 2^63)
          val wp = Array.tabulate(dim) { i0 =>
            var acc = 0L
            var j0 = 0
            while (j0 < dim) { acc += cm(i0 + 1)(j0 + 1) * vm(j0); j0 += 1 }
            acc
          }
          // exact 128-bit square sum → double via the 2^47 split (see
          // the gate scaladoc; the oracle's n-CTEs perform the same
          // split, so the doubles are bit-equal)
          val qq = wp.foldLeft(BigInt(0))((a, w) => a + BigInt(w) * BigInt(w))
          val qd = (qq >> 47).toDouble * 140737488355328.0 +
            (qq & ((BigInt(1) << 47) - 1)).toDouble
          nrm = math.sqrt(qd) / 1e12
          vm = wp.map(w => math.floor(w.toDouble / 1e12 / nrm * 1000000.0 + 0.5).toLong)
        }
        val sg = if (vm(0) < 0) -1L else 1L
        val eig = math.floor(nrm * 1000000.0 + 0.5) / 1000000.0 // r6 twin
        import s.implicits._
        (1 to dim).map(i =>
            (i.toLong, (sg * vm(i - 1)).toDouble / 1000000.0, eig))
          .toDF("i", "loading", "eigval")
      },
      Some {
        val iters = (1 to 4).map { t =>
          val prev = if (t == 1) "v0" else s"v${t - 1}"
          s"""w$t AS (
             |  SELECT c.i, SUM(c.cm * v.vm) AS wp
             |  FROM c JOIN $prev v ON c.j = v.j GROUP BY 1
             |), n$t AS (
             |  SELECT sqrt(CAST(q // 140737488355328 AS DOUBLE)
             |      * 140737488355328.0
             |    + CAST(q % 140737488355328 AS DOUBLE)) / 1e12 AS nrm
             |  FROM (SELECT SUM(CAST(wp AS HUGEINT) * wp) AS q FROM w$t)
             |), v$t AS (
             |  SELECT i AS j, CAST(FLOOR(CAST(wp AS DOUBLE) / 1e12 / nrm
             |    * 1000000.0 + 0.5) AS BIGINT) AS vm
             |  FROM w$t CROSS JOIN n$t
             |)""".stripMargin
        }.mkString(", ")
        s"""WITH $emCteSql, nn AS (
           |  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings
           |), s AS (
           |  SELECT a.i AS i, b.i AS j, SUM(a.xv * b.xv) AS sp
           |  FROM em a JOIN em b USING (vec_id) GROUP BY 1, 2
           |), mu AS (
           |  SELECT i, SUM(xv) AS mm FROM em GROUP BY 1
           |), c AS (
           |  SELECT s.i, s.j,
           |    CAST(FLOOR((CAST(sp AS DOUBLE) / 1e12 / nn.n
           |      - (CAST(ma.mm AS DOUBLE) / 1e6 / nn.n)
           |        * (CAST(mb.mm AS DOUBLE) / 1e6 / nn.n))
           |      * 1000000.0 + 0.5) AS BIGINT) AS cm
           |  FROM s JOIN mu ma ON ma.i = s.i JOIN mu mb ON mb.i = s.j
           |  CROSS JOIN nn
           |), v0 AS (
           |  SELECT i AS j, CAST(125000 AS BIGINT) AS vm
           |  FROM generate_series(1, 64) t(i)
           |), $iters, sg AS (
           |  SELECT CASE WHEN (SELECT vm FROM v4 WHERE j = 1) < 0
           |    THEN -1 ELSE 1 END AS sg
           |)
           |SELECT CAST(j AS BIGINT) AS i,
           |  CAST(sg * vm AS DOUBLE) / 1000000.0 AS loading,
           |  ${r6Sql("nrm")} AS eigval
           |FROM v4 CROSS JOIN sg CROSS JOIN n4 ORDER BY i""".stripMargin
      }),

    // Embedding QC: per-label norm census with 2σ outlier counts — the
    // sanity pass every embedding batch runs before indexing (a broken
    // encoder shows up as a norm-distribution shift long before recall
    // degrades). Norms come from the exact integer lattice (Σ of 1e-6
    // element squares is a plain long, < 2^53, so the double conversion
    // is exact in both engines), means/variances from exact micro-unit
    // long sums; the 2σ flag compares r6-pinned doubles computed from
    // identical integers. Plan: one narrow norm map feeding a per-label
    // aggregate (map-side combine), the |labels|-row stats broadcast
    // back into a narrow flag pass — two scans, zero data-sized
    // shuffles, the same shape at any corpus size.
    NamedQuery(
      "embedding_norm_outliers",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"), expr(
            s"aggregate($microVecExpr, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
            .as("n2"))
          .withColumn("norm", r6(sqrt(col("n2").cast("double")) / lit(1000000.0)))
          .withColumn("nm", floor(col("norm") * lit(1000000.0) + lit(0.5)).cast("long"))
        val stats = e.groupBy(col("label"))
          .agg(count(lit(1)).as("n"), sum(col("nm")).as("s1"),
            sum(col("nm") * col("nm")).as("s2"))
          .withColumn("mean_norm", r6(col("s1").cast("double") / lit(1000000.0) / col("n")))
          .withColumn("sd_norm", r6(sqrt(greatest(
            col("s2").cast("double") / col("n")
              - (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")),
            lit(0.0))) / lit(1000000.0)))
        e.join(broadcast(stats), "label")
          .withColumn("is_out",
            when(abs(col("norm") - col("mean_norm")) > lit(2.0) * col("sd_norm"), 1L)
              .otherwise(0L))
          .groupBy(col("label"), col("n"), col("mean_norm"), col("sd_norm"))
          .agg(sum(col("is_out")).as("n_outliers"))
          .select(col("label"), col("n"), col("mean_norm"), col("sd_norm"),
            col("n_outliers"))
          .orderBy(col("label"))
      },
      Some(s"""WITH $emCteSql, n2s AS (
              |  SELECT vec_id, SUM(xv * xv) AS n2 FROM em GROUP BY 1
              |), nm AS (
              |  SELECT CAST(e.label AS BIGINT) AS label, n.vec_id,
              |    ${r6Sql("sqrt(CAST(n2 AS DOUBLE)) / 1000000.0")} AS norm
              |  FROM n2s n JOIN embeddings e USING (vec_id)
              |), nmm AS (
              |  SELECT label, vec_id, norm,
              |    CAST(FLOOR(norm * 1000000.0 + 0.5) AS BIGINT) AS nm
              |  FROM nm
              |), stats AS (
              |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(SUM(nm) AS BIGINT) AS s1,
              |    CAST(SUM(nm * nm) AS BIGINT) AS s2
              |  FROM nmm GROUP BY 1
              |), st2 AS (
              |  SELECT label, n,
              |    ${r6Sql("CAST(s1 AS DOUBLE) / 1000000.0 / n")} AS mean_norm,
              |    ${r6Sql("sqrt(GREATEST(CAST(s2 AS DOUBLE) / n" +
                " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)," +
                " 0.0)) / 1000000.0")} AS sd_norm
              |  FROM stats
              |)
              |SELECT s.label, s.n, s.mean_norm, s.sd_norm,
              |  CAST(SUM(CASE WHEN ABS(v.norm - s.mean_norm)
              |    > 2.0 * s.sd_norm THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              |FROM nmm v JOIN st2 s USING (label)
              |GROUP BY 1, 2, 3, 4 ORDER BY s.label""".stripMargin)),

    // Temporal train/val/test split with a leakage audit — the
    // time-series discipline hash splits cannot give: train strictly
    // precedes val precedes test (60/20/20 by the integer-exact time
    // RANGE, cutoffs tmin + span·3 DIV 5 and ·4 DIV 5), and the same
    // output row set reports USER overlap between every split pair,
    // because a user appearing on both sides of a temporal boundary is
    // exactly the entity-level leakage an evaluation must know about.
    // All arithmetic is int64 epoch-micros; the audit is a distinct
    // (part, user) self-join — at 100 TB one shuffle of the distinct
    // pairs (≪ events), the split itself a broadcast-bounds narrow map
    // on the same scan every downstream reader already does.
    NamedQuery(
      "dataset_split_temporal",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("tu"), col("user_id"))
        val bounds = ev.agg(min(col("tu")).as("tmin"), max(col("tu")).as("tmax"))
        val parts = ev.crossJoin(broadcast(bounds))
          .withColumn("part",
            when(col("tu") < expr("tmin + (((tmax - tmin) * 3) DIV 5)"), "train")
              .when(col("tu") < expr("tmin + (((tmax - tmin) * 4) DIV 5)"), "val")
              .otherwise("test"))
        val splits = parts.groupBy(col("part"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
        val du = parts.select(col("part"), col("user_id")).distinct()
        val leaks = du.as("x")
          .join(du.as("y"), col("x.user_id") === col("y.user_id")
            && col("x.part") < col("y.part"))
          .groupBy(concat(lit("leak_"), col("x.part"), lit("_"), col("y.part"))
            .as("part"))
          .agg(count(lit(1)).as("n_users"))
          .select(col("part"), lit(0L).as("n_events"), col("n_users"))
        splits.unionAll(leaks).orderBy(col("part"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) AS tu, user_id FROM events
             |), bounds AS (
             |  SELECT MIN(tu) AS tmin, MAX(tu) AS tmax FROM ev
             |), parts AS (
             |  SELECT CASE
             |    WHEN tu < tmin + (((tmax - tmin) * 3) // 5) THEN 'train'
             |    WHEN tu < tmin + (((tmax - tmin) * 4) // 5) THEN 'val'
             |    ELSE 'test' END AS part, user_id
             |  FROM ev CROSS JOIN bounds
             |), splits AS (
             |  SELECT part, CAST(COUNT(*) AS BIGINT) AS n_events,
             |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM parts GROUP BY 1
             |), du AS (
             |  SELECT DISTINCT part, user_id FROM parts
             |), leaks AS (
             |  SELECT 'leak_' || x.part || '_' || y.part AS part,
             |    CAST(0 AS BIGINT) AS n_events,
             |    CAST(COUNT(*) AS BIGINT) AS n_users
             |  FROM du x JOIN du y ON x.user_id = y.user_id
             |    AND x.part < y.part
             |  GROUP BY 1
             |)
             |SELECT * FROM splits UNION ALL SELECT * FROM leaks
             |ORDER BY part""".stripMargin)),

    // Greedy k-center coreset (Gonzalez 1985, the 2-approximation):
    // data-pruning / diverse-subset selection — pick the point farthest
    // from the chosen set, k times. The selection rides the exact
    // micro-unit lattice: squared distances to the (k ≪ N, plan-literal)
    // chosen vectors are plain long sums, and each round is ONE narrow
    // scan into a PARTIAL max over (min-dist, -id, id, vector) — the
    // winner's vector rides the argmax struct, so the round costs
    // exactly one 1-row driver collect (plus one min-struct collect for
    // the data-driven seed = lowest vec_id), the AnnIndex centroid
    // discipline. The radius column (r6 of the exact integer √) is the
    // coverage guarantee: every corpus point sits within that distance
    // of some chosen center when it was picked. At 100 TB: k passes
    // over the scan, zero data-sized shuffles, centers never leave the
    // plan.
    NamedQuery(
      "sample_coreset_kcenter",
      (s, d) => {
        val k = 8
        val xm = Tables.embeddings(s, d)
          .select(col("vec_id"), expr(microVecExpr).as("xm"))
        def d2To(v: Seq[Long]) = {
          import org.apache.spark.sql.functions.{aggregate => fAgg, zip_with}
          fAgg(zip_with(col("xm"), typedLit(v), (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, e) => acc + e)
        }
        val seed = xm.agg(min(struct(col("vec_id"), col("xm"))).as("s"))
          .select(col("s.vec_id"), col("s.xm")).collect()(0)
        var chosen = List((1L, seed.getLong(0), 0.0))
        var vecs = List(seed.getSeq[Long](1))
        while (chosen.length < k) {
          val mind = vecs.map(d2To).reduce(least(_, _))
          val best = xm
            .agg(max(struct(mind.as("d2"), (-col("vec_id")).as("tie"),
              col("vec_id"), col("xm"))).as("b"))
            .select(col("b.vec_id"), col("b.d2"), col("b.xm")).collect()(0)
          val (id, d2v) = (best.getLong(0), best.getLong(1))
          val radius = math.floor(math.sqrt(d2v.toDouble) / 1e6 * 1000000.0 + 0.5) / 1000000.0
          chosen = chosen :+ ((chosen.length + 1L, id, radius))
          vecs = vecs :+ best.getSeq[Long](2)
        }
        import s.implicits._
        chosen.toDF("round", "center_id", "radius")
      },
      Some {
        val k = 8
        val stages = (2 to k).map { t =>
          val prevM = if (t == 2) "d_1" else s"m_${t - 1}"
          s"""c_$t AS (
             |  SELECT vec_id, d2 FROM $prevM ORDER BY d2 DESC, vec_id LIMIT 1
             |), d_$t AS (
             |  SELECT a.vec_id, SUM((a.xv - b.xv) * (a.xv - b.xv)) AS d2
             |  FROM em a JOIN em b ON a.i = b.i
             |    AND b.vec_id = (SELECT vec_id FROM c_$t)
             |  GROUP BY 1
             |), m_$t AS (
             |  SELECT p.vec_id, LEAST(p.d2, q.d2) AS d2
             |  FROM $prevM p JOIN d_$t q USING (vec_id)
             |)""".stripMargin
        }.mkString(", ")
        val rows = (2 to k).map { t =>
          s"""SELECT $t AS round, (SELECT vec_id FROM c_$t) AS center_id,
             |  ${r6Sql(s"sqrt(CAST((SELECT d2 FROM c_$t) AS DOUBLE)) / 1000000.0")}
             |    AS radius""".stripMargin
        }.mkString("\n UNION ALL\n")
        s"""WITH $emCteSql, d_1 AS (
           |  SELECT a.vec_id, SUM((a.xv - b.xv) * (a.xv - b.xv)) AS d2
           |  FROM em a JOIN em b ON a.i = b.i
           |    AND b.vec_id = (SELECT MIN(vec_id) FROM embeddings)
           |  GROUP BY 1
           |), $stages
           |SELECT CAST(round AS BIGINT) AS round,
           |  CAST(center_id AS BIGINT) AS center_id, radius
           |FROM (
           |  SELECT 1 AS round,
           |    (SELECT MIN(vec_id) FROM embeddings) AS center_id,
           |    CAST(0.0 AS DOUBLE) AS radius
           |  UNION ALL
           |$rows
           |) ORDER BY round""".stripMargin
      }),

    // BPE-exact token accounting (round 15 — the r14 verdict's item 3:
    // packing and mixture weights counted whitespace words, but training
    // budgets are counted in TOKENS). The committed 32-merge table
    // (TextOps.BpeMerges, Sennrich et al. 2016 learned offline over the
    // fixture) is applied as a chain of space-wrapped symbol replaces —
    // a pure narrow map (no UDF, no explode, no shuffle), so at 100 TB
    // tokenization runs at scan speed. The oracle replays the identical
    // replace chain per word relationally; TextOpsBpeSpec additionally
    // pins the chain equal to the classic per-symbol merge scan.
    NamedQuery(
      "text_tokenize_bpe",
      (s, d) =>
        // scan fan-out (QueryDsl.fanout): the 32-step replace chain is the
        // heaviest narrow map in the text family and the judged fixture is
        // one row group — measured r21 A/B at sf0.1: 1.51 s -> 0.73 s
        fanout(Tables.documents(s, d).select(col("doc_id"), col("text")))
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_words"),
            expr(TextOps.bpeTokenCountExpr("text")).as("n_tokens_bpe"))
          .withColumn("tokens_per_word",
            r6(col("n_tokens_bpe").cast("double") / col("n_words")))
          .orderBy(col("doc_id")),
      Some(s"""WITH wrds AS (
              |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
              |), toks AS (
              |  SELECT doc_id, UNNEST(w) AS word FROM wrds
              |), enc AS (
              |  SELECT doc_id, ${TextOps.bpeSymbolsSql("word")} AS sy FROM toks
              |), agg AS (
              |  SELECT doc_id, CAST(SUM((length(sy) - length(replace(sy, ' ', '')))
              |    // 2) AS BIGINT) AS n_tokens_bpe
              |  FROM enc GROUP BY 1
              |)
              |SELECT d.doc_id,
              |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
              |  a.n_tokens_bpe,
              |  ${r6Sql("CAST(a.n_tokens_bpe AS DOUBLE) / len(string_split(d.text, ' '))")}
              |    AS tokens_per_word
              |FROM documents d JOIN agg a USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    // Production-vocabulary tokenization (round 16 — the r15 verdict's
    // item 5): the 32-merge replace chain proves the BPE contract but
    // cannot scale to a production merge table (a 50k-deep codegen'd
    // replace chain is not viable). This gate tokenizes the corpus with
    // the COMMITTED 1024-merge table (TextOps.BpeMerges1k, trained
    // offline by tools/train_bpe.py) via the production path: the
    // pair→rank dictionary broadcasts once and TextOps.bpeApply runs the
    // classic merge scan per word inside a narrow mapPartitions — cost
    // independent of table size, tokenization at scan speed. Judged
    // output is the per-source token census (occurrences + vocabulary
    // actually used). The oracle replays the SAME table in table order
    // through a recursive CTE over the distinct-word vocabulary (1024
    // doubled-space replace steps — the r15-proved chain/scan
    // equivalence at production depth; TextOpsBpeSpec pins scan ==
    // table-order == chain on both tables).
    NamedQuery(
      "text_tokenize_bpe_trie",
      (s, d) => {
        // NO multi-distinct aggregate here (round 17): two countDistincts
        // on different columns in one agg go through Catalyst's
        // RewriteDistinctAggregates, whose gid-group numbering hangs on a
        // HashMap over expression trees — hashCodes include global expr
        // ids, so the emitted plan STRING is bi-stable across JVM
        // execution histories (this was the r16 "stale bench-reference
        // row" mystery: ecd25cf0 vs 31a2fa9d, each stable within its own
        // JVM context). Two plain partial-aggregations are also the
        // better 100 TB plan: the rewrite's Expand triples the
        // corpus-token relation before its shuffle; these shuffle only
        // per-group partials.
        val toks = graft.ml.TextOps.bpeTokens(Tables.documents(s, d),
          graft.ml.TextOps.BpeMerges1k)
        val tokStats = toks.groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("occ"))
          .groupBy(col("source"))
          .agg(sum(col("occ")).as("bpe_tokens"),
            count(lit(1)).as("distinct_tokens"))
        val docStats = toks.select(col("source"), col("doc_id")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        docStats.join(tokStats, Seq("source"))
          .select(col("source"), col("n_docs"), col("bpe_tokens"),
            col("distinct_tokens"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH RECURSIVE merges(mi, ma, mb) AS (VALUES
           |  ${graft.ml.TextOps.bpeMerges1kValuesSql}
           |), wf AS (
           |  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
           |  FROM documents
           |), wfx AS (SELECT doc_id, source, w FROM wf WHERE w <> ''),
           |vocab AS (SELECT DISTINCT w FROM wfx),
           |rec(w, s, i) AS (
           |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g'), 0 FROM vocab
           |  UNION ALL
           |  SELECT r.w,
           |    replace(r.s, ' ' || m.ma || '  ' || m.mb || ' ',
           |      ' ' || m.ma || m.mb || ' '),
           |    r.i + 1
           |  FROM rec r JOIN merges m ON m.mi = r.i + 1
           |), done AS (
           |  SELECT w, s FROM rec WHERE i = (SELECT MAX(mi) FROM merges)
           |), toks AS (
           |  SELECT w, UNNEST(string_split(trim(s), '  ')) AS token FROM done
           |)
           |SELECT f.source,
           |  CAST(COUNT(DISTINCT f.doc_id) AS BIGINT) AS n_docs,
           |  CAST(COUNT(*) AS BIGINT) AS bpe_tokens,
           |  CAST(COUNT(DISTINCT t.token) AS BIGINT) AS distinct_tokens
           |FROM wfx f JOIN toks t ON t.w = f.w
           |GROUP BY f.source
           |ORDER BY f.source""".stripMargin
      }),

    // The production-VOCABULARY tokenization at 32k merges (round 20 —
    // the r19 verdict's ask #4): the trie gate proves the 1,024-merge
    // path with a recursive-CTE oracle, but bpeApply's reason to exist
    // is the table size where a replay chain is infeasible — this gate
    // runs the IDENTICAL rank-scan under the committed 32,768-merge
    // table (TextOps.BpeMerges32k, trained over repo + public stdlib
    // text) and its bench steady vs the 1k gate's is the measured form
    // of the "cost independent of table size" claim (the scan is
    // O(passes × word length); only the broadcast dictionary grows).
    // Oracle: a 32k-step recursive CTE cannot run, so the oracle reads
    // the committed per-word encode sheet (the JPEG fixture-oracle
    // pattern; Bpe32kSheetFixtureGen) joined back to the corpus words —
    // and TextOpsBpeSpec keeps the sheet honest by pinning every row
    // equal to the INDEPENDENT table-order replace chain at full 32k
    // depth. A corpus word missing from the sheet undercounts the
    // oracle side and fails the gate loudly.
    NamedQuery(
      "text_tokenize_bpe_32k",
      (s, d) => {
        val toks = TextOps.bpeTokens(Tables.documents(s, d),
          TextOps.BpeMerges32k)
        val tokStats = toks.groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("occ"))
          .groupBy(col("source"))
          .agg(sum(col("occ")).as("bpe_tokens"),
            count(lit(1)).as("distinct_tokens"))
        val docStats = toks.select(col("source"), col("doc_id")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        docStats.join(tokStats, Seq("source"))
          .select(col("source"), col("n_docs"), col("bpe_tokens"),
            col("distinct_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH sheet AS (
              |  SELECT word, string_split(toks, ' ') AS tl
              |  FROM read_parquet('$bpe32kFixtureDir/expected.parquet/*.parquet')
              |), wf AS (
              |  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
              |  FROM documents
              |), wfx AS (SELECT doc_id, source, w FROM wf WHERE w <> ''),
              |toks AS (
              |  SELECT word, UNNEST(tl) AS token FROM sheet
              |)
              |SELECT f.source,
              |  CAST(COUNT(DISTINCT f.doc_id) AS BIGINT) AS n_docs,
              |  CAST(COUNT(*) AS BIGINT) AS bpe_tokens,
              |  CAST(COUNT(DISTINCT t.token) AS BIGINT) AS distinct_tokens
              |FROM wfx f JOIN toks t ON t.word = f.w
              |GROUP BY f.source
              |ORDER BY f.source""".stripMargin)),

    // The packing gate on REAL token counts: pack_sequences_greedy's
    // judged grid-window assignment (same shard/window/chunk contract,
    // ONE budget constant of 512) with the document cost measured in
    // BPE tokens instead of whitespace words — the accounting a training
    // run actually budgets by. Round 17: the cost is the PRODUCTION
    // 1024-merge vocabulary (TextOps.withBpeTokenCount — a 32-merge
    // vocab over-fragments real text and inflates every chunk budget);
    // the oracle replays the trie gate's recursive-CTE table-order chain
    // over the distinct-word vocabulary and sums per document. The
    // word-count gate is retained for round-over-round comparability;
    // this is the token-exact sibling.
    NamedQuery(
      "pack_sequences_bpe",
      (s, d) => {
        val docs = TextOps.withBpeTokenCount(
            Tables.documents(s, d)
              .select(col("doc_id"), col("source"), col("text")),
            "text", "tokens", TextOps.BpeMerges1k)
          .select(col("doc_id"), col("source"), col("tokens"),
            hashId(col("text"), 2147483647L).as("hk"))
          .withColumn("shard", col("hk") % 8)
        val w = Window.partitionBy(col("source"), col("shard"))
          .orderBy(col("hk"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("cum", sum(col("tokens")).over(w))
          .withColumn("chunk_id", expr("(cum - tokens) div 512"))
          .groupBy(col("source"), col("shard"), col("chunk_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("token_sum"))
          .orderBy(col("source"), col("shard"), col("chunk_id"))
      },
      Some(s"""WITH RECURSIVE ${TextOps.bpe1kWordTokensSql("documents", "_p")},
              |docbpe AS (
              |  SELECT doc_id, CAST(SUM(t.n) AS BIGINT) AS tokens
              |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
              |        FROM documents) f
              |  JOIN wtok_p t ON t.w = f.w
              |  GROUP BY 1
              |), docs AS (
              |  SELECT d.doc_id, d.source, COALESCE(b.tokens, 0) AS tokens,
              |    ${hashIdSql("d.text", 2147483647L)} AS hk
              |  FROM documents d LEFT JOIN docbpe b USING (doc_id)
              |), packed AS (
              |  SELECT source, hk % 8 AS shard, tokens,
              |    SUM(tokens) OVER (PARTITION BY source, hk % 8
              |      ORDER BY hk, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM docs
              |)
              |SELECT source, shard, CAST((cum - tokens) // 512 AS BIGINT) AS chunk_id,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(tokens) AS BIGINT) AS token_sum
              |FROM packed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Cross-source contamination matrix (round 15 — the r14 verdict's
    // item 5): dedup_decontaminate audits train-vs-benchmark; the
    // general pre-training audit is source×source — directional word
    // 8-gram containment between every source pair, the
    // similarity_containment contract lifted to corpus grain. Grams ride
    // as md5 digests (16 bytes, never text); a DOC-df cap bounds hub
    // n-grams (boilerplate matches everything and carries no overlap
    // signal — the ShingleDfCap rationale) so a gram contributes at most
    // cap² pair rows; the |sources|² frame comes from a broadcast cross
    // of the TINY distinct-source list (the corpus-sized gram relation
    // is never cartesian-joined — spec-asserted), with zero-overlap
    // pairs reported explicitly, not dropped.
    NamedQuery(
      "dedup_source_overlap_matrix",
      (s, d) => {
        // scan fan-out before the 8-gram explode + per-gram md5 — the
        // heaviest map in this family; one-row-group fixture otherwise
        // runs it on one core (r21 A/B at sf0.1: 3.05 s -> 2.18 s)
        val docGrams = fanout(
            Tables.documents(s, d).select(col("source"), col("doc_id"), col("text")))
          .select(col("source"), col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("source"), col("doc_id"),
            explode(expr(TextOps.wordNGramsExpr(8))).as("g"))
          .select(col("source"), col("doc_id"), md5(col("g")).as("gh"))
          .distinct()
        val capped = docGrams
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .filter(col("df") <= lit(SrcGramDfCap))
        val srcGrams = capped.select(col("source"), col("gh")).distinct()
        val sizes = srcGrams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
        val shared = srcGrams.select(col("source").as("source_a"), col("gh"))
          .hint("shuffle_hash")
          .join(srcGrams.select(col("source").as("source_b"), col("gh"))
            .hint("shuffle_hash"), "gh")
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_shared"))
        val srcs = Tables.documents(s, d).select(col("source")).distinct()
        srcs.select(col("source").as("source_a"))
          .crossJoin(broadcast(srcs.select(col("source").as("source_b"))))
          .join(shared, Seq("source_a", "source_b"), "left")
          .join(broadcast(sizes.select(col("source").as("source_a"),
            col("n_grams").as("n_a"))), Seq("source_a"), "left")
          .join(broadcast(sizes.select(col("source").as("source_b"),
            col("n_grams").as("n_b"))), Seq("source_b"), "left")
          .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
          .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
          .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
          .withColumn("containment_a_in_b",
            when(col("n_a") > 0,
              r6(col("n_shared").cast("double") / col("n_a"))).otherwise(lit(0.0)))
          .select(col("source_a"), col("source_b"), col("n_shared"),
            col("n_a"), col("n_b"), col("containment_a_in_b"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some(s"""WITH wrds AS (
              |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
              |), dg AS (
              |  SELECT DISTINCT source, doc_id,
              |    md5(array_to_string(w[i:i+7], ' ')) AS gh
              |  FROM wrds, LATERAL (SELECT UNNEST(generate_series(1,
              |    len(w) - 7)) AS i) t
              |  WHERE len(w) >= 8
              |), dfs AS (
              |  SELECT gh, CAST(COUNT(*) AS BIGINT) AS df FROM dg GROUP BY 1
              |), sg AS (
              |  SELECT DISTINCT dg.source, dg.gh
              |  FROM dg JOIN dfs USING (gh) WHERE df <= $SrcGramDfCap
              |), sizes AS (
              |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sg GROUP BY 1
              |), shared AS (
              |  SELECT a.source AS sa, b.source AS sb,
              |    CAST(COUNT(*) AS BIGINT) AS ns
              |  FROM sg a JOIN sg b USING (gh) GROUP BY 1, 2
              |), srcs AS (
              |  SELECT DISTINCT source FROM documents
              |)
              |SELECT a.source AS source_a, b.source AS source_b,
              |  CAST(COALESCE(sh.ns, 0) AS BIGINT) AS n_shared,
              |  CAST(COALESCE(za.n, 0) AS BIGINT) AS n_a,
              |  CAST(COALESCE(zb.n, 0) AS BIGINT) AS n_b,
              |  CASE WHEN COALESCE(za.n, 0) > 0
              |    THEN ${r6Sql("CAST(COALESCE(sh.ns, 0) AS DOUBLE) / za.n")}
              |    ELSE 0.0 END AS containment_a_in_b
              |FROM srcs a CROSS JOIN srcs b
              |LEFT JOIN shared sh ON sh.sa = a.source AND sh.sb = b.source
              |LEFT JOIN sizes za ON za.source = a.source
              |LEFT JOIN sizes zb ON zb.source = b.source
              |ORDER BY source_a, source_b""".stripMargin)),

    // Unicode NFC normalization + mojibake heuristic (round 15 — the r14
    // verdict's item 6): the corpus fixture is ASCII, so the gate
    // INJECTS deterministic decomposed sequences (combining acute /
    // diaeresis / cedilla, by doc_id mod 4) and a classic
    // UTF-8-read-as-Latin-1 mojibake token (doc_id mod 5) — both
    // engines build the identical raw string, normalize it (JVM
    // java.text.Normalizer NFC vs DuckDB nfc_normalize — the same
    // Unicode algorithm), and report codepoint counts before/after, the
    // digest of the normalized text (pinning every byte), and the
    // integer-exact mojibake count/flag (the Gopher-rules style). The
    // same normalizeNfc column runs in ml.Curate BEFORE digesting, so
    // dedup sees composed content (CurateSpec pins it).
    NamedQuery(
      "text_normalize_unicode",
      (s, d) => {
        val prefix = when(col("doc_id") % 4 === 0, lit("café "))
          .when(col("doc_id") % 4 === 1, lit("über "))
          .when(col("doc_id") % 4 === 2, lit("Ça "))
          .otherwise(lit(""))
        val moji = when(col("doc_id") % 5 === 0, lit(" Ã©tÃ©"))
          .otherwise(lit(""))
        Tables.documents(s, d)
          .withColumn("raw", concat(prefix, col("text"), moji))
          .withColumn("nfc", TextOps.normalizeNfc(col("raw")))
          .withColumn("n_moji",
            size(expr("regexp_extract_all(raw, 'Ã.', 0)")).cast("long"))
          .select(col("doc_id"),
            length(col("raw")).cast("long").as("n_raw"),
            length(col("nfc")).cast("long").as("n_nfc"),
            md5(col("nfc")).as("nfc_digest"),
            col("n_moji"),
            when(col("n_moji") > 0, 1L).otherwise(0L).as("moji_flag"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH raw AS (
              |  SELECT doc_id,
              |    CASE WHEN doc_id % 4 = 0 THEN 'café '
              |         WHEN doc_id % 4 = 1 THEN 'über '
              |         WHEN doc_id % 4 = 2 THEN 'Ça '
              |         ELSE '' END || text ||
              |    CASE WHEN doc_id % 5 = 0 THEN ' Ã©tÃ©'
              |         ELSE '' END AS s
              |  FROM documents
              |)
              |SELECT doc_id, CAST(length(s) AS BIGINT) AS n_raw,
              |  CAST(length(nfc_normalize(s)) AS BIGINT) AS n_nfc,
              |  md5(nfc_normalize(s)) AS nfc_digest,
              |  CAST(len(regexp_extract_all(s, 'Ã.')) AS BIGINT) AS n_moji,
              |  CAST(CASE WHEN len(regexp_extract_all(s, 'Ã.')) > 0
              |    THEN 1 ELSE 0 END AS BIGINT) AS moji_flag
              |FROM raw ORDER BY doc_id""".stripMargin)),

    // Incremental IVF maintenance judged end-to-end (round 15 — the r14
    // verdict's item 4: SCALE.md promised hot-cell re-splitting no gate
    // exercised). Base corpus (vec_id < 400) is indexed under the FROZEN
    // seed quantizer; the batch (vec_id >= 400) is appended via
    // AnnIndex.addBatch — batch assignment is the k-dots narrow map,
    // growth is counted per cell, and cells past mean + mean/16 (the
    // test bound that makes the balanced fixture split; production
    // passes its own policy) re-split into two children seeded by the
    // cell's two lowest members with ONE judged lloydStep round. The
    // oracle replays everything: frozen assignment (the shared
    // ivfAssignSql contract — base-build assignment and batch-append
    // assignment are the same formula under a frozen model), growth
    // counts, split selection, child id allocation in ascending parent
    // order, the two-seed cosine argmax (ties to the parent child), the
    // micro-unit mean update, and the empty-child seed carry. Output
    // pins every final centroid coordinate, the census, and the
    // child→parent lineage.
    NamedQuery(
      "ann_update_incremental",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val base = e.filter(col("vec_id") < 400)
        val batch = e.filter(col("vec_id") >= 400)
        val m0 = graft.ml.AnnIndex.build(base, k = 8, iters = 0)
        val indexed = graft.ml.AnnIndex.assignCells(base, m0)
          .select(col("vec_id"), col("embedding"), col("cell"))
        val total = e.count()
        val bound = total / 8 + total / 128 // mean + mean/16, exact int div
        val r = graft.ml.AnnIndex.addBatch(indexed, batch, m0, bound)
        r.model.centroids.sortBy(_._1).map { case (cid, v) =>
          val q = v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
          (cid, r.splitFrom.getOrElse(cid, cid), r.census.getOrElse(cid, 0L),
            q.map(x => x * x).sum,
            q.zipWithIndex.map { case (x, i) =>
              ((x + 1000000L) % 2147483647L) * (i + 1L)
            }.sum % 2147483647L)
        }.toSeq.toDF("cell", "parent", "n_assigned", "norm2_micro",
            "centroid_checksum")
          .orderBy(col("cell"))
      },
      Some(s"""WITH ${MLQueries.ivfAssignSql}, cellcounts AS (
              |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM assigned GROUP BY 1
              |), params AS (
              |  SELECT CAST(SUM(n) // 8 + SUM(n) // 128 AS BIGINT) AS bound
              |  FROM cellcounts
              |), splitc AS (
              |  SELECT cell, CAST(ROW_NUMBER() OVER (ORDER BY cell) AS BIGINT)
              |    AS srn
              |  FROM cellcounts, params WHERE n > bound
              |), seedv AS (
              |  SELECT s2.cell, s2.rn, e.embedding
              |  FROM (
              |    SELECT a.cell, a.vec_id, ROW_NUMBER() OVER (
              |      PARTITION BY a.cell ORDER BY a.vec_id) AS rn
              |    FROM assigned a JOIN splitc USING (cell)
              |  ) s2 JOIN embeddings e ON e.vec_id = s2.vec_id
              |  WHERE s2.rn <= 2
              |), childids AS (
              |  SELECT sc.cell AS parent, sv.rn,
              |    CAST(CASE WHEN sv.rn = 1 THEN sc.cell
              |      ELSE 7 + sc.srn END AS BIGINT) AS child
              |  FROM splitc sc JOIN seedv sv ON sv.cell = sc.cell
              |), childscore AS (
              |  SELECT m.vec_id, ci.child, ci.parent,
              |    ${r6Sql(MLQueries.duckDot("e.embedding", "sv.embedding") +
                   s" / (${MLQueries.duckNorm("e.embedding")} * ${MLQueries.duckNorm("sv.embedding")})")} AS csim
              |  FROM assigned m
              |  JOIN embeddings e ON e.vec_id = m.vec_id
              |  JOIN seedv sv ON sv.cell = m.cell
              |  JOIN childids ci ON ci.parent = m.cell AND ci.rn = sv.rn
              |), childassign AS (
              |  SELECT vec_id, child FROM (
              |    SELECT vec_id, child, ROW_NUMBER() OVER (
              |      PARTITION BY vec_id ORDER BY csim DESC, child) AS crn
              |    FROM childscore
              |  ) WHERE crn = 1
              |), chexpl AS (
              |  SELECT ca.child, CAST(i AS BIGINT) AS dim,
              |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
              |      AS BIGINT) AS qv
              |  FROM childassign ca JOIN embeddings e USING (vec_id)
              |  CROSS JOIN generate_series(1, 64) t(i)
              |), chupd AS (
              |  SELECT child, dim, COUNT(qv) AS cnt,
              |    CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(qv) + 0.5) AS BIGINT)
              |      AS qmean
              |  FROM chexpl GROUP BY 1, 2
              |), chseed AS (
              |  SELECT ci.child, ci.parent, CAST(i AS BIGINT) AS dim,
              |    CAST(FLOOR(CAST(sv.embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
              |      AS BIGINT) AS sq
              |  FROM childids ci
              |  JOIN seedv sv ON sv.cell = ci.parent AND sv.rn = ci.rn
              |  CROSS JOIN generate_series(1, 64) t(i)
              |), chcent AS (
              |  SELECT g.child, g.parent, g.dim, COALESCE(u.qmean, g.sq) AS q
              |  FROM chseed g LEFT JOIN chupd u
              |    ON u.child = g.child AND u.dim = g.dim
              |), chcensus AS (
              |  SELECT child, MAX(cnt) AS n FROM chupd GROUP BY 1
              |), keptgrid AS (
              |  SELECT e.vec_id AS cell, CAST(i AS BIGINT) AS dim,
              |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
              |      AS BIGINT) AS q
              |  FROM embeddings e CROSS JOIN generate_series(1, 64) t(i)
              |  WHERE e.vec_id < 8
              |    AND e.vec_id NOT IN (SELECT cell FROM splitc)
              |), allcent AS (
              |  SELECT cell, cell AS parent, dim, q FROM keptgrid
              |  UNION ALL
              |  SELECT child AS cell, parent, dim, q FROM chcent
              |), allcensus AS (
              |  SELECT e.vec_id AS cell, CAST(COALESCE(ct.n, 0) AS BIGINT) AS n
              |  FROM embeddings e LEFT JOIN cellcounts ct ON ct.cell = e.vec_id
              |  WHERE e.vec_id < 8
              |    AND e.vec_id NOT IN (SELECT cell FROM splitc)
              |  UNION ALL
              |  SELECT ci.child, CAST(COALESCE(cc.n, 0) AS BIGINT)
              |  FROM (SELECT DISTINCT child FROM childids) ci
              |  LEFT JOIN chcensus cc USING (child)
              |)
              |SELECT a.cell, a.parent, cs.n AS n_assigned,
              |  CAST(SUM(q * q) AS BIGINT) AS norm2_micro,
              |  CAST(SUM(((q + 1000000) % 2147483647) * dim) % 2147483647
              |    AS BIGINT) AS centroid_checksum
              |FROM allcent a JOIN allcensus cs ON cs.cell = a.cell
              |GROUP BY a.cell, a.parent, cs.n ORDER BY a.cell""".stripMargin)),
  )

}

package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** FloatVecDot: codegen path ≡ interpreted path ≡ the lambda fold it
  * replaced (bit-exact, since the oracle compare depends on it).
  */
class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  private val lambdaDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def randVecs(seed: Int): Seq[(Seq[Float], Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f)))
  }

  test("kernel equals the zip_with/aggregate fold bit-for-bit") {
    val df = randVecs(7).toDF("a", "b")
    val rows = df.select(
      VectorOps.vecDot(col("a"), col("b")).as("kernel"),
      expr(lambdaDot).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval equals codegen result") {
    val vecs = randVecs(11)
    val df = vecs.toDF("a", "b")
    val fromSpark = df.select(VectorOps.vecDot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val reference = vecs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    fromSpark.zip(reference).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) === java.lang.Double.doubleToLongBits(w))
    }
  }

  test("null and empty inputs") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
    val got = df.select(VectorOps.vecDot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) === 0.0)
  }

  test("norm is sqrt of self-dot") {
    val df = Seq(Seq(3.0f, 4.0f)).toDF("a")
    assert(df.select(VectorOps.vecNorm(col("a"))).collect()(0).getDouble(0) === 5.0)
  }

  test("floatWeightedDot equals the interpreted aggregate() plane fold bit-for-bit") {
    // the LSH plane-dot contract: fused loop == the DOUBLE-typed lambda
    // fold on the exact hyperplane weight formula (j = 0..7). The
    // division literal must be cast: a bare `/ 1000003.0` parses as
    // DECIMAL(8,1) in Spark SQL, routing the weight through decimal
    // division (scale-9 HALF_UP) — ~1e-16 off the pure-double weight
    // DuckDB computes for the same spelling. The old interpreted plane
    // dot silently rode that decimal path; the fused expression pins the
    // ORACLE's double semantics on both engines, retiring the residual
    // near-zero sign-flip risk.
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(40)(Seq.fill(64)(rnd.nextFloat() - 0.5f))
    val df = vecs.toDF("embedding")
    for (j <- 0 until 8) {
      val weights = (0 until 64).map(i =>
        (((i + 1).toLong * (j + 7) * 2654435761L) % 1000003L) / 1000003.0 - 0.5)
      val lambda = expr(
        s"""aggregate(sequence(0, size(embedding) - 1), CAST(0 AS DOUBLE),
           |  (acc, i) -> acc + CAST(embedding[i] AS DOUBLE) *
           |    (CAST((CAST((i + 1) * ($j + 7) AS BIGINT) * 2654435761) % 1000003
           |      AS DOUBLE) / CAST(1000003 AS DOUBLE) - 0.5D))""".stripMargin)
      val rows = df.select(
        VectorOps.floatWeightedDot(col("embedding"), weights).as("fused"),
        lambda.as("fold")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"plane $j drifted from the lambda fold")
      }
    }
    // null propagates; short vectors bound by min-length
    val edge = Seq(Option(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]).toDF("embedding")
    val w2 = Seq(0.5, 0.25, 99.0)
    val got = edge.select(VectorOps.floatWeightedDot(col("embedding"), w2)).collect()
    assert(got(0).getDouble(0) === 1.0)
    assert(got(1).isNullAt(0))
  }

  test("nearestCentroid: argmax contract vs a per-row Scala reference") {
    // the fused expression must equal the old per-centroid column chain:
    // r6-rounded cosine, FIRST (= lowest id, callers sort) wins ties,
    // null embedding -> -1
    val rnd = new scala.util.Random(13)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong / 1e6
    def norm(v: Seq[Float]) =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val cents = (0 until 9).map(i => i.toLong -> Seq.fill(16)(rnd.nextFloat() - 0.5f))
    val vecs = Seq.fill(40)(Seq.fill(16)(rnd.nextFloat() - 0.5f))
    val expected = vecs.map { v =>
      val nv = norm(v)
      var best = Double.NegativeInfinity; var id = -1L
      cents.foreach { case (cid, c) =>
        val dot = v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y.toDouble }
        val sim = r6d(dot / (nv * norm(c)))
        if (sim > best) { best = sim; id = cid }
      }
      id
    }
    val got = vecs.toDF("a").select(VectorOps.nearestCentroid(col("a"),
      cents.map(_._1), cents.map(_._2.toArray), cents.map(c => norm(c._2))))
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected)
    // a duplicated centroid ties exactly -> the first id wins
    val dup = Seq(cents.head._2, cents.head._2).zipWithIndex
      .map { case (c, i) => (10L + i, c) }
    val tied = vecs.take(5).toDF("a").select(VectorOps.nearestCentroid(col("a"),
      dup.map(_._1), dup.map(_._2.toArray), dup.map(c => norm(c._2))))
      .collect().map(_.getLong(0)).toSeq
    assert(tied.forall(_ === 10L), "ties must keep the first-listed id")
    // null embedding falls through to the old chain's -1 literal
    val withNull = Seq(Option(Seq.fill(16)(0.25f)), Option.empty[Seq[Float]]).toDF("a")
    val nulls = withNull.select(VectorOps.nearestCentroid(col("a"),
      cents.map(_._1), cents.map(_._2.toArray), cents.map(c => norm(c._2))))
      .collect().map(_.getLong(0))
    assert(nulls(1) === -1L)
  }

  test("nearestCentroidRank: rank-r selection vs a Scala reference; rank 0 == nearestCentroid") {
    // the multi-probe expression must equal ROW_NUMBER() OVER
    // (ORDER BY r6-cosine DESC, list position) = rank+1 — the ordering
    // the ivfProbed oracle replays — and collapse to the judged
    // nearestCentroid argmax at rank 0
    val rnd = new scala.util.Random(41)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong / 1e6
    def norm(v: Seq[Float]) =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val cents = (0 until 9).map(i => i.toLong -> Seq.fill(16)(rnd.nextFloat() - 0.5f))
    val vecs = Seq.fill(40)(Seq.fill(16)(rnd.nextFloat() - 0.5f))
    def rankRef(v: Seq[Float], r: Int): Long = {
      val nv = norm(v)
      cents.zipWithIndex.map { case ((cid, c), pos) =>
        val dot = v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y.toDouble }
        (-r6d(dot / (nv * norm(c))), pos, cid) // sim desc, position asc
      }.sorted.apply(r)._3
    }
    val df = vecs.toDF("a")
    for (r <- Seq(0, 1, 3, 8)) {
      val got = df.select(VectorOps.nearestCentroidRank(col("a"),
        cents.map(_._1), cents.map(_._2.toArray), cents.map(c => norm(c._2)), r))
        .collect().map(_.getLong(0)).toSeq
      assert(got === vecs.map(rankRef(_, r)), s"rank $r selection diverged")
    }
    // rank 0 is bit-identical to the judged argmax expression
    val both = df.select(
      VectorOps.nearestCentroidRank(col("a"), cents.map(_._1),
        cents.map(_._2.toArray), cents.map(c => norm(c._2)), 0).as("r0"),
      VectorOps.nearestCentroid(col("a"), cents.map(_._1),
        cents.map(_._2.toArray), cents.map(c => norm(c._2))).as("c"))
      .collect()
    assert(both.forall(r => r.getLong(0) === r.getLong(1)))
    // exact ties (duplicated centroid): rank 0 the first listed, rank 1
    // the duplicate — position order, never id re-sorting
    val dup = Seq((10L, cents.head._2), (7L, cents.head._2))
    for ((r, want) <- Seq(0 -> 10L, 1 -> 7L)) {
      val tied = vecs.take(5).toDF("a").select(VectorOps.nearestCentroidRank(
        col("a"), dup.map(_._1), dup.map(_._2.toArray),
        dup.map(c => norm(c._2)), r)).collect().map(_.getLong(0))
      assert(tied.forall(_ === want), s"tie at rank $r must keep list order")
    }
    // null embedding -> -1 (the assignCells fall-through)
    val nulls = Seq(Option.empty[Seq[Float]]).toDF("a")
      .select(VectorOps.nearestCentroidRank(col("a"), cents.map(_._1),
        cents.map(_._2.toArray), cents.map(c => norm(c._2)), 1))
      .collect().map(_.getLong(0))
    assert(nulls(0) === -1L)
    // rank out of range refuses at construction, not silently at eval
    intercept[IllegalArgumentException](VectorOps.nearestCentroidRank(
      col("a"), cents.map(_._1), cents.map(_._2.toArray),
      cents.map(c => norm(c._2)), 9))
  }

  test("nearestCodeword: PQ argmin at the production k*=256, score twin consistent") {
    // 256 codewords per subspace is the standard 8-bit PQ code — the
    // per-codeword column fan-out this expression replaced cannot even
    // PLAN there; the fused loop must both run AND match a Scala
    // reference of the judged encode formula r6(||c||^2 - 2 x.c) with
    // first-listed tie-break on the sliced input
    val rnd = new scala.util.Random(29)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong / 1e6
    def sq(v: Seq[Float]) = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
    val k = 256; val off = 16; val len = 16
    val cws = (0 until k).map(c => c.toLong -> Seq.fill(len)(rnd.nextFloat() - 0.5f))
    val vecs = Seq.fill(30)(Seq.fill(64)(rnd.nextFloat() - 0.5f))
    val expected = vecs.map { v =>
      val x = v.slice(off, off + len)
      var best = Double.PositiveInfinity; var id = -1L
      cws.foreach { case (cid, c) =>
        val dot = x.zip(c).foldLeft(0.0) { case (a, (p, q)) => a + p.toDouble * q.toDouble }
        val s = r6d(sq(c) - 2.0 * dot)
        if (s < best) { best = s; id = cid }
      }
      (id, best)
    }
    val df = vecs.toDF("a")
    def nc(score: Boolean) = VectorOps.nearestCodeword(col("a"), off, len,
      cws.map(_._1), cws.map(_._2.toArray), cws.map(c => sq(c._2)), score)
    val got = df.select(nc(false).as("code"), nc(true).as("s")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }
}

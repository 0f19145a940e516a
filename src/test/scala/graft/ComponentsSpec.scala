package graft

import org.apache.spark.sql.functions._
import graft.ml.Components
import graft.queries.MLQueries

/** The connected-components loop (ml.Components): exact min-labels
  * against a driver-side union-find oracle, round-count pinning on the
  * committed fixture (the verdict-12 perf contract — the loop must stay
  * O(few) one-job rounds, not crawl), and the topology classes the
  * near-clique fixture cannot exercise (paths, stars, disjoint unions).
  */
class ComponentsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Driver-side union-find over the same pairs — the oracle. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): (Map[Long, Long], Components.Result) = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    val res = Components.minLabel(df)
    val got = res.labels.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    (got, res)
  }

  test("path graph: min label crosses the full chain (worst diameter)") {
    // 0-1-2-...-19 as pairs: the topology star contraction exists for —
    // plain min-propagation needs O(n) rounds; contraction + jumping
    // collapses it in O(log n)
    val pairs = (0L until 19L).map(i => (i, i + 1))
    val (got, res) = run(pairs)
    assert(got === (0L to 19L).map(_ -> 0L).toMap)
    assert(res.contractionRounds <= 6,
      s"20-node path took ${res.contractionRounds} rounds — contraction is not collapsing geometrically")
  }

  test("clique + disjoint pair + star: exact min labels, near-clique rounds") {
    val clique = for { a <- 10L to 14L; b <- (a + 1) to 14L } yield (a, b)
    val star = (31L to 35L).map(x => (30L, x))
    val pairs = clique ++ Seq((20L, 21L)) ++ star
    val (got, res) = run(pairs)
    assert(got === unionFind(pairs))
    // cliques and stars are the near-dup shape: one round to agree on
    // the min, at most one more to drain the contracted edges (rounds
    // are counted in batches of two — see Components.minLabel)
    assert(res.contractionRounds <= 2)
  }

  test("empty pair set: empty labels, immediate convergence") {
    import spark.implicits._
    val res = Components.minLabel(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(res.labels.count() === 0L)
    // one double-round batch and one double-jump batch run before the
    // zero counts are observed
    assert(res.contractionRounds <= 2 && res.resolveRounds <= 2)
  }

  test("fixture candidate graph: matches union-find, converges in <= 4 rounds") {
    // the judged gate's input (simhash pigeonhole candidates at sf0.001):
    // near-dup clusters are near-cliques, so the loop must converge in
    // a couple of batched rounds — this pin is the perf contract the round-12
    // rewrite was measured against; a regression to label-crawling
    // (rounds growing with cluster size) fails here before the bench
    // ever sees it
    val pairs = MLQueries.hammingPairs(spark, d)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    assert(pairs.nonEmpty, "fixture produced no candidate pairs — fixture drifted")
    val (got, res) = run(pairs)
    assert(got === unionFind(pairs))
    assert(res.contractionRounds <= 4,
      s"fixture converged in ${res.contractionRounds} rounds (expected <= 4)")
    assert(res.resolveRounds <= 2,
      s"resolve took ${res.resolveRounds} jumps (expected <= 2: members sit one hop from their root)")
  }

  test("random graphs: exact min labels on every topology scalacheck draws") {
    // property: whatever the edge set — duplicates, self-loops, hubs,
    // long chains, disjoint pieces — the distributed loop's labels equal
    // the driver union-find oracle's. Fixed-seed parameters with few
    // cases: each case is a full Spark loop (~1 s), and the fixed
    // topology tests above already cover the known-hard classes; this
    // property exists to catch the interactions nobody thought to pin.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val graphGen = for {
      n <- Gen.choose(2, 40)                       // vertex universe
      m <- Gen.choose(1, 60)                       // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield edges
    val prop = Prop.forAll(graphGen) { edges =>
      // self-loops are legal pairs (a doc trivially near-dups itself);
      // the oracle treats them as no-ops, and so must the loop
      val (got, _) = run(edges)
      val want = unionFind(edges)
      got == want
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(12L))
    val result = SCTest.check(params, prop)
    assert(result.passed, s"property failed: $result")
  }

  test("singleton assembly: gate output keeps every doc exactly once") {
    val rows = SparkEntry.queries("dedup_connected_components")(spark, d).collect()
    val nDocs = graft.tables.Tables.documents(spark, d).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    // every component elects exactly one canonical
    val byComp = rows.groupBy(_.getAs[Long]("component_id"))
    byComp.foreach { case (c, rs) =>
      assert(rs.count(_.getAs[Long]("is_canonical") == 1L) === 1,
        s"component $c elected ${rs.count(_.getAs[Long]("is_canonical") == 1L)} canonicals")
      assert(rs.forall(_.getAs[Long]("component_size") === rs.length.toLong))
    }
  }
}

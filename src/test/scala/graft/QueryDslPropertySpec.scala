package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import graft.queries.QueryDsl

/** Property pins for the cross-engine determinism primitives every judged
  * gate builds on. Each property executes the SPARK expression (through
  * Catalyst + codegen, not a driver shortcut) and compares against an
  * independent JVM reference — BigDecimal / BigInteger / MessageDigest —
  * so a Spark upgrade or an edit to QueryDsl that shifts any of these
  * contracts fails loudly here before it silently breaks 156 oracle
  * hashes.
  */
class QueryDslPropertySpec extends SparkSpec {

  private def check(p: org.scalacheck.Prop): Unit =
    assert(org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p).passed)

  /** Evaluate one Column over single-value rows through a real plan. */
  private def evalDoubles(xs: Seq[Double], c: org.apache.spark.sql.Column): Seq[Double] = {
    import spark.implicits._
    xs.toDF("x").select(c.as("y")).collect().map(_.getDouble(0)).toSeq
  }

  test("r6 through Catalyst equals the driver IEEE formula bit-for-bit") {
    val gen = Gen.listOfN(50, Gen.choose(-1000.0, 1000.0))
    check(forAll(gen) { xs =>
      val viaSpark = evalDoubles(xs, QueryDsl.r6(col("x")))
      val viaDriver = xs.map(x => math.floor(x * 1000000.0 + 0.5) / 1000000.0)
      viaSpark == viaDriver
    })
  }

  test("dsum is exact and order-independent on the 1e-4 grid") {
    // summands on the grid dsum's DECIMAL(18,4) carries exactly: any
    // permutation must produce the identical double, equal to the
    // BigDecimal sum — this is the property plain double sums lack
    val gen = Gen.listOfN(60, Gen.choose(-99999L, 99999L).map(_ / 10000.0))
    check(forAll(gen) { xs =>
      import spark.implicits._
      def run(ys: Seq[Double]): Double =
        ys.toDF("x").agg(QueryDsl.dsum(col("x")).as("s"))
          .collect()(0).getDouble(0)
      val exact = xs.map(BigDecimal(_)).sum.toDouble
      xs.isEmpty || (run(xs) == exact && run(xs.reverse) == exact)
    })
  }

  test("hash60 equals the driver md5-prefix reference; hashId lands in [0, m)") {
    val gen = Gen.listOfN(30, Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(forAll(gen) { ss =>
      import spark.implicits._
      val viaSpark = ss.toDF("x")
        .select(QueryDsl.hash60(col("x")).as("h"),
          QueryDsl.hashId(col("x"), 997L).as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaDriver = ss.map { s =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = d.map(b => f"${b & 0xff}%02x").mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      viaSpark.map(_._1) == viaDriver &&
        viaSpark.zip(viaDriver).forall { case ((_, m), h) =>
          m == h % 997L && m >= 0L && m < 997L
        }
    })
  }

  test("the 2^47 split conversion IS correct rounding (BigInteger.doubleValue)") {
    // hi*2^47 is exact (hi < 2^53 for qq < 2^100), lo < 2^47 is exact,
    // and the single IEEE add correctly rounds their exact sum — so the
    // split must agree with BigInteger's correctly-rounded conversion on
    // EVERY qq in the pca gate's square-sum range, including the
    // round-to-even tie boundaries where DuckDB's direct HUGEINT cast
    // diverges (the reason the split exists; see embedding_pca_power)
    val gen = for {
      m <- Gen.choose(0L, (1L << 52) - 1)
      low <- Gen.choose(0L, 2047L)
      tie <- Gen.oneOf(0L, 1L << 43)
    } yield (BigInt(m) << 44) + tie + low
    check(forAll(gen) { qq =>
      val split = (qq >> 47).toDouble * 140737488355328.0 +
        (qq & ((BigInt(1) << 47) - 1)).toDouble
      split == qq.doubleValue
    })
  }

  test("the micro lattice through Catalyst equals the driver quantizer per element") {
    val gen = Gen.listOfN(20, Gen.choose(-1.0f, 1.0f))
    check(forAll(gen) { fs =>
      import spark.implicits._
      val viaSpark = Seq(fs).toDF("embedding")
        .select(expr(graft.queries.CurationQueries.microVecExpr).as("xm"))
        .collect()(0).getSeq[Long](0).toSeq
      val viaDriver = fs.map(f => math.floor(f.toDouble * 1000000.0 + 0.5).toLong)
      viaSpark == viaDriver
    })
  }
}

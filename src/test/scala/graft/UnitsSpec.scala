package graft

import org.apache.spark.sql.functions._
import graft.parse.Units
import graft.ingest.QueryInfoParser
import org.scalacheck.Prop.forAll
import org.scalacheck.Gen

/** A5 unit parsing — fixtures from FIXTURES.md §1.3 + round-trip property. */
class UnitsSpec extends SparkSpec {

  private def check(p: org.scalacheck.Prop): Unit =
    assert(org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p).passed)

  private def evalTime(s: String): Option[Double] = QueryInfoParser.parseTime(s)
  private def evalSize(s: String): Option[Double] = QueryInfoParser.parseSize(s)

  test("duration suffixes (extract.py:30-38 order)") {
    assert(evalTime("1.5ns").get === 1.5 * 1e-9) // float multiply, like the reference
    assert(evalTime("2ms").get === 0.002)
    assert(evalTime("3us").get === 3e-6)
    assert(evalTime("4.5s").get === 4.5)
    assert(evalTime("2m").get === 120.0)
    assert(evalTime("1h").get === 3600.0)
    assert(evalTime("0.5d").get === 43200.0)
    assert(evalTime("7").get === 7.0) // plain float, no suffix
    assert(QueryInfoParser.parseTime(null) === None)
  }

  test("size suffixes are 1024-based (extract.py:40-46)") {
    assert(evalSize("1.2TB").get === 1.2 * math.pow(1024, 4))
    assert(evalSize("3GB").get === 3.0 * math.pow(1024, 3))
    assert(evalSize("10MB").get === 10.0 * 1048576)
    assert(evalSize("512kB").get === 512.0 * 1024)
    assert(evalSize("100B").get === 100.0)
  }

  test("Column expression matches the Scala parser") {
    import spark.implicits._
    val inputs = Seq("1.5ns", "2ms", "3us", "4.5s", "2m", "1h", "0.5d", "7", null)
    val df = inputs.toDF("s")
      .select(col("s"), Units.timeSeconds(col("s")).as("t"))
    val got = df.collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    val want = inputs.map(s => Option(s).flatMap(QueryInfoParser.parseTime))
    assert(got.toSeq === want)
    val sizes = Seq("1.2TB", "3GB", "10MB", "512kB", "100B", null)
    val got2 = sizes.toDF("s").select(Units.sizeBytes(col("s")))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(got2.toSeq === sizes.map(s => Option(s).flatMap(QueryInfoParser.parseSize)))
  }

  test("round-trip property: format then parse") {
    val gen = for {
      v <- Gen.choose(0.0, 999.0)
      (suffix, factor) <- Gen.oneOf(Seq(("ms", 1e-3), ("s", 1.0), ("m", 60.0), ("h", 3600.0)))
    } yield (v, suffix, factor)
    check(forAll(gen) { case (v, suffix, factor) =>
      val parsed = QueryInfoParser.parseTime(s"$v$suffix").get
      math.abs(parsed - v * factor) <= math.ulp(v * factor) * 4
    })
  }

  test("malformed input is null, not an exception") {
    import spark.implicits._
    val got = Seq("garbage", "12xs", "").toDF("s")
      .select(Units.timeSeconds(col("s"))).collect().map(r => r.isNullAt(0))
    assert(got.forall(identity))
  }
}

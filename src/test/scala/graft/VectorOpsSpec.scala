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
}

package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two reusable chart-data reductions (SURVEY §2.A17/A18).
  *
  * Both end in tiny results (≤ a few dozen rows) but start from
  * workload-sized inputs. Scale discipline: anything touching the
  * unbounded input (totals, top-k, remainder sums) runs as distributed
  * aggregates / TakeOrdered / broadcast joins; partition-less windows are
  * only ever applied to the ≤ top-row result set.
  */
object ChartOps {

  /** `numpy.round(x, d)` replica (`analyze.py:475`, `:640`): numpy scales
    * by 10^d, rounds half-to-EVEN on the scaled double (rint), and divides
    * back down (numpy.round(12.125, 2) == 1212/100 == 12.12 exactly, not
    * 1212*0.01). `bround(x, d)` alone is NOT equivalent — it rounds the
    * shortest decimal repr, so e.g. 2.675 → 2.68 where numpy gives 2.67;
    * brounding the pre-scaled value at 0 decimals reproduces rint exactly.
    */
  private def npRound(c: Column, decimals: Int): Column = {
    val p = math.pow(10.0, decimals)
    bround(c * lit(p), 0) / lit(p)
  }

  /** `pie_chart` (`analyze.py:460-515`): input = (key, value) rows.
    * Ranked desc by value (ties by key, matching Python's stable sort over
    * the key-sorted groupby); keep the first `top-1` entries with share
    * > 0.1%; roll the rest into "All the rest"; percents rounded to 2dp
    * (half-even, numpy semantics) with the LAST row absorbing the rounding
    * residual so Σ == 100 (`analyze.py:474-476`).
    *
    * Output: (key, value, pct), kept rows first (desc), rest last.
    *
    * Cache ownership: the two cached intermediates below are key-bounded
    * (per-key aggregate; ≤ top assembled rows) and stay pinned until the
    * session clears them — correct for the CLI commands (one analyze/
    * report run per session) and for Bench (which clearCache()s between
    * queries); a long-lived service embedding many pie calls should
    * `spark.catalog.clearCache()` per batch.
    */
  def pie(counts: DataFrame, keyCol: String, valueCol: String, top: Int = 20): DataFrame = {
    // pre-aggregate by key: callers pass per-key aggregates (unique keys,
    // identity here), and a duplicate key can then never fall between the
    // kept set and the anti-joined remainder and silently lose its mass
    // cached: the per-key aggregate is vocabulary-bounded (users, operator
    // types, table names — never raw rows) and is consumed by FOUR separate
    // jobs below (total broadcast, top-k, anti-join remainder, final
    // assembly); without the cache each of them re-runs the workload-sized
    // aggregation upstream. CacheManager dedups repeated pie calls on the
    // same input.
    val base = counts
      .select(col(keyCol).cast("string").as("key"), col(valueCol).cast("double").as("value"))
      .groupBy(col("key")).agg(sum(col("value")).as("value"))
      .cache()
    // scalar total broadcast to every row — never a single-partition window
    // over the (unbounded) per-key aggregate
    val total = base.agg(sum(col("value")).as("total")).filter(col("total") =!= 0.0)
    // "first top-1 entries in desc order" plans as TakeOrderedAndProject:
    // each partition forwards its local top-(top-1), no global sort.
    val kept = base
      .orderBy(col("value").desc, col("key")).limit(top - 1)
      .crossJoin(broadcast(total))
      .filter(col("value") * 100.0 / col("total") > 0.1)
      .select(col("key"), col("value"), lit(0L).as("is_rest"))
    // the remainder is summed directly (reference: values[~relevant].sum()),
    // via a broadcast anti-join against the ≤19 kept keys — null-SAFE
    // equality, or a kept NULL key would also be counted into the rest;
    // the crossJoin with the (possibly empty) total relation keeps the
    // reference's all-zero bail-out (`if not sum_values: return`,
    // analyze.py:463-464)
    val keptKeys = kept.select(col("key").as("kept_key"))
    val rest = base.join(broadcast(keptKeys), col("key") <=> col("kept_key"), "left_anti")
      .crossJoin(broadcast(total))
      .groupBy().agg(sum(col("value")).as("value"))
      .filter(col("value").isNotNull)
      .select(lit("All the rest").as("key"), col("value"), lit(1L).as("is_rest"))
    // the ≤top-row tail is window-free too: the grand total, the rounding
    // residual, and last-row detection are scalar aggregates broadcast
    // back in (no partition-less WindowExec anywhere). The LAST row in
    // output order (kept desc, rest last) absorbs the residual so Σ==100.
    val ord = struct(col("is_rest"), (-col("value")).as("nv"), col("key"))
    // ≤ top rows; cached for the same reason — tails/sumRound/final each
    // materialize it
    val unioned = kept.unionAll(rest).cache()
    val tails = unioned.agg(sum(col("value")).as("total"), max(ord).as("last_key"))
    val flagged = unioned.crossJoin(broadcast(tails))
      .withColumn("pct_round", npRound(col("value") * 100.0 / col("total"), 2))
      .withColumn("is_last", ord === col("last_key"))
    val sumRound = flagged.agg(sum(col("pct_round")).as("sum_round"))
    flagged.crossJoin(broadcast(sumRound))
      .withColumn("pct",
        when(col("is_last"), col("pct_round") + (lit(100.0) - col("sum_round")))
          .otherwise(col("pct_round")))
      .orderBy(col("is_rest"), col("value").desc, col("key"))
      .select(col("key"), col("value"), col("pct"))
  }

  /** `wall_by_selectivity_bins` (`analyze.py:622-686`): values binned by
    * `abs(round1(x - step/2))` (numpy round1 = half-even) — ALWAYS rounded
    * to one decimal, even for
    * the bins=100 variant (the reference quirk); weights become percent of
    * total; every `arange(0, max, step)` bin is padded in (with its own
    * 2-decimal label, NOT re-binned — so the 100-bin variant pads labels
    * 0.01..0.19 that real data can never hit); bins beyond max+1e-9 are
    * labeled "Above". Output: (bin_label, pct) sorted by label, "Above"
    * last (string sort does that: digits < 'A' is false in ASCII, 'A' > '9').
    */
  def selectivityBins(points: DataFrame, selCol: String, weightCol: String,
      bins: Int, maxSelectivity: Double): DataFrame = {
    val spark = points.sparkSession
    val step = 1.0 / bins
    // null selectivity cannot reach the reference's arithmetic
    // (analyze.py:630-631 builds the arrays from present stats only); an
    // unguarded null here would fall through `when(bin <= max)` into the
    // "Above" bin with its full weight
    val pts = points
      .select(col(selCol).cast("double").as("x"), col(weightCol).cast("double").as("w"))
      .filter(col("x").isNotNull && col("w").isNotNull)
    // the reference bails out before padding when there are no points
    // (analyze.py:633-634) — padding alone would divide by a zero total
    if (pts.isEmpty)
      return pts.select(lit("").as("label"), lit(0.0).as("pct")).limit(0)
    val binned = pts
      .withColumn("bin", abs(npRound(col("x") - lit(step / 2), 1)))
      .withColumn("label",
        when(col("bin") <= maxSelectivity + 1e-9, format_string("%.2f", col("bin")))
          .otherwise(lit("Above")))
    // pad: arange(0, max, step) labeled directly (not re-binned)
    val nPad = math.ceil(maxSelectivity / step - 1e-9).toInt
    val pad = spark.range(0, nPad)
      .select(format_string("%.2f", col("id").cast("double") * lit(step)).as("label"),
        lit(0.0).as("w"))
    // percent per POINT then sum per label — the reference's aggregation
    // order (`wall = wall / wall.sum() * 100` at analyze.py:645, then
    // groupby-sum), kept bit-compatible; the total is a broadcast scalar
    // aggregate, never a single-partition window over raw points
    val all = binned.select(col("label"), col("w")).unionAll(pad)
    val total = all.agg(sum(col("w")).as("total"))
    all.crossJoin(broadcast(total))
      .withColumn("pct", col("w") / col("total") * 100.0)
      .groupBy(col("label")).agg(sum(col("pct")).as("pct"))
      .orderBy(col("label"))
  }
}

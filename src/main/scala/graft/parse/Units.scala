package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unit-suffix parsing (SURVEY §2.A5; reference `extract.py:30-63`).
  *
  * Reference semantics, replicated exactly:
  *  - durations: suffixes checked in order `ns, ms, us, s, m, h, d`
  *    (two-char suffixes first, so `"1ns"` parses as nanos, not `"1n"`+s);
  *    result in seconds.
  *  - sizes: suffixes `TB, GB, MB, kB, B` (largest first); result in bytes.
  *  - null input → null; no recognized suffix → plain float parse;
  *    unparseable → null.
  *
  * Implemented as pure Column expressions over built-ins so the whole thing
  * stays inside whole-stage codegen — no UDF, no codegen fallback. At 100 TB
  * this runs per-row during ingest, so staying codegen'd matters.
  */
object Units {

  // shared with QueryInfoParser's JVM-side parser — ONE factor table so the
  // Column-side and record-side parsers cannot drift
  private[graft] val timeFactors: Seq[(String, Double)] = Seq(
    "ns" -> 1e-9, "ms" -> 1e-3, "us" -> 1e-6,
    "s" -> 1.0, "m" -> 60.0, "h" -> 3600.0, "d" -> 86400.0)

  // 1024-based, matching the reference (extract.py:40-46)
  private[graft] val sizeFactors: Seq[(String, Double)] = Seq(
    "TB" -> math.pow(1024, 4), "GB" -> math.pow(1024, 3),
    "MB" -> 1048576.0, "kB" -> 1024.0, "B" -> 1.0)

  /** `"1.5m"` → 90.0 seconds; `"7"` → 7.0; null-safe. */
  def timeSeconds(c: Column): Column = build(c, timeFactors)

  /** `"3.2GB"` → 3.2e9 bytes; `"100"` → 100.0; null-safe. */
  def sizeBytes(c: Column): Column = build(c, sizeFactors)

  // foldRight keeps the reference's first-match-wins suffix order: the first
  // factor becomes the outermost `when`.
  private def build(c: Column, factors: Seq[(String, Double)]): Column = {
    val plain = c.try_cast("double")
    factors.foldRight(plain) { case ((suffix, factor), els) =>
      when(c.endsWith(suffix),
        c.substr(lit(1), length(c) - lit(suffix.length)).try_cast("double")
          * lit(factor)
      ).otherwise(els)
    }
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession

/** Housekeeping for the bounded streaming gates (dedup_stream_near,
  * analyzer_trend_stream). Each invocation registers a fresh
  * counter-suffixed memory-sink view (the returned DataFrame reads it, so
  * the CURRENT sink must outlive the gate call) and a scratch checkpoint
  * dir. Without cleanup a bench session (warmup + cold + warm per gate)
  * accumulates every drained sink's rows in driver memory and leaves
  * scratch dirs under /tmp across runs.
  */
object GateStream {

  /** Drop the PREVIOUS invocations' sink views for `prefix` — called
    * before registering the next one, so at most one sink per gate is
    * ever live and its rows become collectable once replaced.
    */
  def dropStaleSinks(spark: SparkSession, prefix: String): Unit =
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith(prefix))
      .foreach(t => spark.catalog.dropTempView(t.name))

  /** Delete a FINISHED query's scratch checkpoint directory (AvailableNow
    * has drained; the memory sink, not the checkpoint, backs the judged
    * result). Best-effort: a cleanup failure must never fail a gate.
    */
  def deleteScratch(dir: String): Unit =
    try {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try
          walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    } catch { case _: Exception => () }
}

package graft.process

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 2.5 (reference `jsonl_process.py`): schema filtering + name
  * obfuscation over the summary table.
  *
  * The reference walks raw nested JSON per line (`nested_lookup`); on the
  * normalized schema each key lives in a known column, so filtering is a
  * plain predicate and obfuscation a deterministic dictionary join — both
  * distribute, and the dictionary ("translation table", printed by the
  * reference at `jsonl_process.py:186-194`) is itself a DataFrame.
  *
  * First-seen-order encoding (`NameObfuscator`, `jsonl_process.py:53-76`)
  * is order-dependent in the reference (file iteration order); here it is
  * made deterministic as dense_rank over first occurrence = min(query_id)
  * (SURVEY §7.4), which reproduces the reference ordering when files are
  * processed in query-id order (they are: paths are sorted,
  * `extract.py:183`).
  */
object JsonlProcess {

  /** A13 `filter_line` on a normalized column: keep rows where `column`
    * equals `value`; `includeAbsent` keeps rows with a null in the column
    * (the reference's "key absent ⇒ keep" semantics).
    */
  def filterByColumn(df: DataFrame, column: String, value: String,
      includeAbsent: Boolean = true): DataFrame =
    if (includeAbsent) df.filter(col(column).isNull || col(column) === value)
    else df.filter(col(column) === value)

  /** Build the translation table for one column: distinct values →
    * `prefix0, prefix1, …` in first-seen (min query_id) order.
    */
  def translationTable(df: DataFrame, column: String, prefix: String): DataFrame =
    df.filter(col(column).isNotNull && col(column) =!= "")
      .groupBy(col(column).as("old_name"))
      .agg(min(col("query_id")).as("first_seen"))
      .withColumn("new_name", concat(lit(prefix),
        (dense_rank().over(
          // total first-seen order is the dictionary's contract (tokens
          // are assigned sequentially), so this window is single-partition
          // by nature — over the distinct-name aggregate, never the rows
          Window.orderBy(col("first_seen"), col("old_name"))) - 1)
          .cast("string")))
      .select(col("old_name"), col("new_name"))

  /** A14/A15: replace `column` values via a translation table built with
    * [[translationTable]] (empty strings pass through unchanged, matching
    * `NameObfuscator.__call__`'s `''` guard).
    */
  def obfuscateColumn(df: DataFrame, column: String, prefix: String): DataFrame = {
    val table = translationTable(df, column, prefix)
    df.join(broadcast(table), df(column) === table("old_name"), "left")
      .withColumn(column, coalesce(col("new_name"), col(column)))
      .drop("old_name", "new_name")
  }

  /** `ListObfuscator` (`jsonl_process.py:68-76`): obfuscate every element
    * of an array<string> column through ONE shared dictionary (the
    * reference's partitionIds case). First-seen order is (min query_id,
    * min position) — the deterministic equivalent of its sequential scan.
    */
  def obfuscateArrayColumn(df: DataFrame, column: String, prefix: String): DataFrame = {
    val exploded = df
      .select(col("query_id"), posexplode(col(column)).as(Seq("pos", "old_name")))
    // '' never enters the dictionary (NameObfuscator's guard) but keeps its
    // position in the rebuilt array
    val table = exploded
      .filter(col("old_name") =!= "")
      .groupBy(col("old_name"))
      .agg(min(struct(col("query_id"), col("pos"))).as("first_seen"))
      .withColumn("new_name", concat(lit(prefix),
        (dense_rank().over(
          // total first-seen order is the dictionary's contract (tokens
          // are assigned sequentially), so this window is single-partition
          // by nature — over the distinct-name aggregate, never the rows
          Window.orderBy(col("first_seen"), col("old_name"))) - 1)
          .cast("string")))
      .select(col("old_name"), col("new_name"))
    val rebuilt = exploded
      .join(broadcast(table), Seq("old_name"), "left")
      .withColumn("mapped",
        when(col("old_name") === "", lit("")).otherwise(col("new_name")))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mapped")))),
        c => c.getField("mapped")).as("__obf"))
    // null arrays stay null; empty arrays stay empty (explode emits no rows
    // for either, so distinguish via the original column)
    df.join(rebuilt, Seq("query_id"), "left")
      .withColumn(column,
        when(col(column).isNull, lit(null).cast("array<string>"))
          .otherwise(coalesce(col("__obf"), array().cast("array<string>"))))
      .drop("__obf")
  }

  /** `--remove-query` equivalent: blank the query text. */
  def removeQuery(df: DataFrame): DataFrame =
    df.withColumn("query", lit(""))

  /** `--rename-user` equivalent (user + principal share one dictionary in
    * the reference; the summary schema carries only `user`).
    */
  def renameUsers(df: DataFrame): DataFrame =
    obfuscateColumn(df, "user", "user")
}

package graft

/** Throwaway single-threaded profiler for the ingest parse path (r21
  * optimization round): decomposes per-document cost into gunzip+decode,
  * Jackson readTree, and the full QueryInfoParser.parse, over the first N
  * corpus files. Not a test; run via `Test/runMain graft.IngestProfileMain`.
  */
object IngestProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = graft.ingest.QueryInfoCorpus.ensure()
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz")).sortBy(_.getName).take(n)
    println(s"profiling ${files.length} files from $dir")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def readString(f: java.io.File): String = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(f), 65536)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    def readBytes(f: java.io.File): Array[Byte] = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(f), 65536)
      try in.readAllBytes() finally in.close()
    }
    // warmup JIT
    files.take(100).foreach(f => graft.ingest.QueryInfoParser.parse(readString(f)))
    val strs = timed("gunzip+decode->String")(files.map(readString))
    val bytes = timed("gunzip->bytes")(files.map(readBytes))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def safe(f: => Unit): Unit = try f catch { case _: Exception => () }
    timed("readTree(String)")(strs.foreach(s => safe(mapper.readTree(s))))
    timed("readTree(bytes)")(bytes.foreach(b => safe(mapper.readTree(b))))
    timed("parse(full, from String)")(strs.foreach(graft.ingest.QueryInfoParser.parse))
    timed("parse(full, 2nd run)")(strs.foreach(graft.ingest.QueryInfoParser.parse))
    val totalBytes = strs.map(_.length.toLong).sum
    println(s"total decoded chars: $totalBytes")

    // Spark-side decomposition over the FULL corpus: scan-only vs
    // parse+encode (extract) vs the census gate
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, length => flen, sum => fsum}
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val raw = spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.json*").text(dir)
    for (pass <- 1 to 2) {
      timed(s"scan-only (sum length) #$pass")(
        raw.agg(fsum(flen(col("value")))).collect())
      timed(s"extract->noop #$pass")(
        noop(graft.ingest.Extract.extract(spark, dir).toDF()))
      timed(s"census gate->noop #$pass")(
        noop(SparkEntry.queries("ingest_flatten_census")(spark, dir)))
    }
    // alternative source: binaryFile scan + JVM-side gunzip via mapPartitions
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json*").load(dir)
      .select(col("content"))
    import spark.implicits._
    def gunzipStr(b: Array[Byte]): String = {
      val in: java.io.InputStream =
        if (b.length > 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte)
          new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b), 65536)
        else new java.io.ByteArrayInputStream(b)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    for (pass <- 1 to 2) {
      timed(s"binaryFile scan-only (sum length) #$pass")(
        bin.agg(fsum(flen(col("content")))).collect())
      timed(s"binaryFile gunzip+parse->count #$pass")(
        println("  parsed=" + bin.as[Array[Byte]].mapPartitions(
          _.flatMap(b => graft.ingest.QueryInfoParser.parse(gunzipStr(b)))).count()))
    }
    spark.stop()
  }
}

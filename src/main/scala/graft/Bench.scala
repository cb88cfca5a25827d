package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def jstr(s: String): String = Jsons.escape(s)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // No args (driver mode): run everything. With args: run only the named
    // queries and dump their formatted plans (local profiling aid).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    if (args.nonEmpty) selected.foreach { case (name, fn) =>
      println(s"===== $name ====="); fn(spark, sfDir).explain("formatted")
    }
    // Warm up the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first measured query isn't charged for JVM startup.
    // events needs its dedicated reader (TIMESTAMP(NANOS) legacy conf).
    Tables.names.foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
                 else Tables.table(spark, sfDir, t)
        df.limit(1).count()
      } catch { case _: Throwable => () }
    }
    // Per-query timing with explicit failure recording: a query that
    // throws keeps its elapsed time but is listed in "errors" and counted
    // in "failed" — a regression can't masquerade as a speedup.
    val results = selected.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(160))
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""errors":$errs,"failed":${results.count(_._3.isDefined)},"sf":${jstr(sfDir)}}"""
    // Optional file sink so a consumer never has to strip sbt's [info]
    // prefix from the line.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    // Stdout for the driver — printed LAST, after the session is fully
    // stopped with logging silenced, so no shutdown WARN line can trail
    // the JSON (r1's driver parse failed on exactly that).
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}

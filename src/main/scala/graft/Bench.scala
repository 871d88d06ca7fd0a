package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up: JVM/codegen/parquet-footer init out of query timings.
    // events.ts is TIMESTAMP(NANOS) — same legacy conf the query path sets.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column (a count() would let
      // Catalyst prune the projections/windows being benchmarked)
      val err =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = runs.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = runs.collect { case (k, _, Some(e)) => (k, e) }
    val errJson = failed
      .map { case (k, e) => "\"" + k + "\":\"" + e.replaceAll("[\"\\\\\n\r]", " ") + "\"" }
      .mkString("{", ",", "}")
    val total = runs.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    // a dead query must NOT masquerade as a fast success
    if (failed.nonEmpty) sys.exit(1)
  }
}

package graft

import graft.load.TimeSeriesLoader
import graft.core.{FileDiscoveryConfig, Reports}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}

/** End-user quickstart: the reference's `examples/io_demo.ipynb` walkthrough
  * (discover -> metadata -> load+concat -> continuity -> resample -> report)
  * on a generated fixture directory, each stage printing its product and
  * asserting its contract — so the demo doubles as an acceptance smoke for
  * a clean checkout.
  *
  * Usage: scripts/demo.sh           (wrapper: compiles then runs this main)
  *        scripts/run.sh graft.Demo [workDir]
  *
  * The fixture mirrors the notebook's data layout: per-cabinet subfolders
  * (`Main_LV_1A_Tot`, `Main_LV_1B_Tot`), each holding date-ranged CSVs named
  * `<charge> - Data_Tot - MM-DD-YYYY HH_MM_SS - MM-DD-YYYY HH_MM_SS.csv`,
  * semicolon-separated, `dd/MM/yyyy HH:mm` timestamps, messy numerics and a
  * deliberate 2-hour gap — everything the loader has to clean up.
  */
object Demo {

  /** Deterministic saw-tooth "sensor" value; no RNG so reruns are
    * byte-identical.
    */
  private def value(i: Int): String = f"${20.0 + (i % 48) * 0.25}%.2f"

  private def writeFixture(root: Path): Unit = {
    val hdr = "timestamp;Cabinet - Main - Power_kW; humidity\n"
    def rows(day: Int, fromMin: Int, untilMin: Int): String =
      (fromMin until untilMin by 10).map { m =>
        val h = m / 60
        val hum = if (m % 170 == 0) "n/a" else (30 + (m / 10) % 40).toString
        f"$day%02d/01/2024 $h%02d:${m % 60}%02d;${value(day * 144 + m / 10)};$hum\n"
      }.mkString

    val a = root.resolve("Main_LV_1A_Tot")
    val b = root.resolve("Main_LV_1B_Tot")
    Files.createDirectories(a)
    Files.createDirectories(b)
    // cabinet 1A: two continuation files, day 1 and day 2
    Files.writeString(a.resolve(
      "D2 - UPS Supply 1A - Data_Tot - 01-01-2024 00_00_00 - 01-01-2024 23_59_59.csv"),
      hdr + rows(1, 0, 1440))
    Files.writeString(a.resolve(
      "D2 - UPS Supply 1A - Data_Tot - 01-02-2024 00_00_00 - 01-02-2024 23_59_59.csv"),
      hdr + rows(2, 0, 1440))
    // cabinet 1B: one file with a deliberate 2h hole (10:00-12:00)
    Files.writeString(b.resolve(
      "D2 - UPS Supply 1B - Data_Tot - 01-01-2024 00_00_00 - 01-01-2024 23_59_59.csv"),
      hdr + rows(1, 0, 600) + rows(1, 720, 1440))
    // chaff the discovery stage must reject, with reasons
    Files.writeString(b.resolve("notes.txt"), "not a csv\n")
    Files.writeString(b.resolve("no-dates-in-name.csv"), "a;b\n1;2\n")
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.map(Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft-demo"))
    val dataA = work.resolve("data").resolve("Main_LV_1A_Tot")
    writeFixture(work.resolve("data"))
    println(s"[demo] fixture written under ${work.resolve("data")}")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. discovery + filename metadata + sequence validation ----
    // `filePattern = "*"` widens the glob so the chaff reaches the
    // validator and shows up in the stats with a reason.
    val loader = new TimeSeriesLoader(spark,
      discovery = FileDiscoveryConfig(filePattern = "*"))
    val (metas, stats) = loader.discoverAndValidate(dataA.toString)
    println(s"[demo] 1A discovery: found=${stats.totalFound} " +
      s"valid=${stats.valid} invalid=${stats.invalid}")
    metas.foreach(m => println(s"[demo]   ${Paths.get(m.filepath).getFileName}" +
      s" [${m.startTime.getOrElse("?")} .. ${m.endTime.getOrElse("?")}]"))
    require(metas.size == 2, s"expected 2 valid 1A files, got ${metas.size}")

    // ---- 2. load + concatenate (ONE multi-path csv scan) ----
    val loaded = loader.loadFiles(metas, Some(stats))
    val df = loaded.df
    println(s"[demo] loaded schema: ${df.columns.mkString(", ")}")
    df.show(3, truncate = false)
    val meta = loaded.concatMetadata
    println(s"[demo] concat metadata: total_files=${meta("total_files")} " +
      s"start=${meta("start_time")} end=${meta("end_time")}")
    val n = df.count()
    require(n == 288, s"expected 288 ten-minute rows across 2 days, got $n")
    require(df.columns.contains("Power_kW"),
      "column cleaning should keep the last ' - ' segment")
    require(df.columns.contains("source_file"), "per-file metadata attached")

    // ---- 3. continuity: the 1B file with the planted 2h hole ----
    val loadedB = new TimeSeriesLoader(spark)
      .load(work.resolve("data").resolve("Main_LV_1B_Tot").toString)
    val report = loadedB.analyzeContinuity()
    println(s"[demo] 1B continuity: freq=${report.inferredFrequency} " +
      s"points=${report.totalPoints} coverage=${report.coveragePercent}%")
    report.gaps.foreach(g =>
      println(s"[demo]   gap ${g.start} -> ${g.end} (${g.duration})"))
    require(report.inferredFrequency.contains("600s"),
      s"expected 600s cadence, got ${report.inferredFrequency}")
    // the hole spans 10:00-12:00; the gap is measured from the last point
    // BEFORE it (09:50), so it surfaces as 2h10m
    require(report.gaps.exists(_.duration.toMinutes == 130),
      "the planted 2h hole must surface as a gap")

    // ---- 4. resample the gappy series to 30min means + forward-fill ----
    val resampled = loadedB.resample("30min",
      methodResample = Some("mean"), methodFill = Some("ffill"))
    println(s"[demo] 1B resampled to 30min: ${resampled.count()} rows")
    resampled.orderBy("timestamp").show(5, truncate = false)
    val res = resampled.count()
    require(res == 48, s"expected 48 half-hour buckets over 00:00-23:50, got $res")

    // ---- 5. reports: file coverage + collected errors as JSON ----
    val fr = loadedB.fileReport()
    println(s"[demo] 1B file report: files=${fr.totalFiles} " +
      s"span=${fr.totalSpan} coverage=${fr.coveragePercent}%")
    val errPath = work.resolve("error_report.json").toString
    Reports.exportErrorReport(loaded.errors, errPath)
    println(s"[demo] error report written to $errPath")

    println("[demo] ALL STAGES GREEN")
    spark.stop()
  }
}

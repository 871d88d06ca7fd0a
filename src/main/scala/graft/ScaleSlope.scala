package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale-slope probe with MEMORY instrumentation: runs named queries
  * against a scale directory and records, per query, wall time plus the
  * task-level resource profile a cluster capacity plan needs —
  * max task peak execution memory, max single-task shuffle read (the
  * partition-size proxy: the number that must stay under executor memory
  * at the next decade), total shuffle read/write, and spill.
  *
  * This is what `Bench` can't see: two queries with the same wall time
  * can sit at opposite ends of the headroom scale (one streams 1000 small
  * partitions, one sorts a single 20 GB one). The 128 GiB sandbox bound
  * makes max-task metrics the real risk gauge for the next 10× —
  * SCALE.md's sf3 table is produced by this main.
  *
  * Usage: scripts/run.sh graft.ScaleSlope <sfDir> <query> [query...]
  * Output: one JSON line per query.
  */
object ScaleSlope {

  private final class TaskMetricsListener extends SparkListener {
    val peakExecMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskShuffleRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskShuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val totalShuffleRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val totalShuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val totalSpillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val totalSpillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)

    private def accMax(a: java.util.concurrent.atomic.AtomicLong, v: Long): Unit = {
      var cur = a.get()
      while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
    }

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        nTasks.incrementAndGet()
        accMax(peakExecMem, m.peakExecutionMemory)
        val sr = m.shuffleReadMetrics.totalBytesRead
        val sw = m.shuffleWriteMetrics.bytesWritten
        accMax(maxTaskShuffleRead, sr)
        accMax(maxTaskShuffleWrite, sw)
        totalShuffleRead.addAndGet(sr)
        totalShuffleWrite.addAndGet(sw)
        totalSpillMem.addAndGet(m.memoryBytesSpilled)
        totalSpillDisk.addAndGet(m.diskBytesSpilled)
        if (perStage != null) perStage.synchronized {
          val s = perStage.getOrElseUpdate(t.stageId, new StageAgg)
          s.n += 1
          s.maxWrite = math.max(s.maxWrite, sw)
          s.maxRead = math.max(s.maxRead, sr)
          s.totWrite += sw
          s.totRead += sr
          s.spill += m.memoryBytesSpilled
          s.maxDurMs = math.max(s.maxDurMs, m.executorRunTime)
          s.totDurMs += m.executorRunTime
        }
      }
    }

    // per-stage task aggregates — the query-level maxima above say THAT a
    // straggler exists; this says WHERE (stage callsite = which operator)
    final class StageAgg {
      var n = 0L; var maxWrite = 0L; var maxRead = 0L
      var totWrite = 0L; var totRead = 0L; var spill = 0L
      var maxDurMs = 0L; var totDurMs = 0L
    }
    val perStage: scala.collection.mutable.Map[Int, StageAgg] =
      if (sys.env.contains("SPARK_GRAFT_STAGES"))
        scala.collection.mutable.Map.empty
      else null
    val stageNames: scala.collection.mutable.Map[Int, String] =
      scala.collection.mutable.Map.empty

    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      if (perStage != null) perStage.synchronized {
        stageNames(s.stageInfo.stageId) =
          s.stageInfo.name.takeWhile(_ != '\n').take(120)
      }

    def reset(): Unit = {
      Seq(peakExecMem, maxTaskShuffleRead, maxTaskShuffleWrite,
        totalShuffleRead, totalShuffleWrite, totalSpillMem, totalSpillDisk,
        nTasks).foreach(_.set(0L))
      if (perStage != null) perStage.synchronized {
        perStage.clear(); stageNames.clear()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSlope <sfDir> <query> [query...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // a cluster sizes shuffle partitions to DATA, not to one box's cores;
    // overriding lets the probe separate "operator is super-linear" from
    // "32 static partitions stopped fitting per-task at this decade"
    // (the rel_triangle_count sf3 spill case — see SCALE.md round 9)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // Spark 4.1 union partitioning mis-claim — same pin as Bench/Verify
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    def mb(v: Long): Double = math.round(v / 1048.576) / 1000.0

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      listener.reset()
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events post asynchronously (the bus drain API is
      // private[spark]); settle-poll: done when the task counter holds
      // still for 500 ms, bounded at 5 s
      var last = -1L
      var waited = 0
      while (waited < 10 && listener.nTasks.get() != last) {
        last = listener.nTasks.get()
        Thread.sleep(500)
        waited += 1
      }
      val line = f"""{"query":"$name","sec":$sec%.2f,"tasks":${listener.nTasks.get()},"peak_exec_mem_mb":${mb(listener.peakExecMem.get())},"max_task_shuffle_read_mb":${mb(listener.maxTaskShuffleRead.get())},"max_task_shuffle_write_mb":${mb(listener.maxTaskShuffleWrite.get())},"total_shuffle_read_mb":${mb(listener.totalShuffleRead.get())},"total_shuffle_write_mb":${mb(listener.totalShuffleWrite.get())},"spill_mem_mb":${mb(listener.totalSpillMem.get())},"spill_disk_mb":${mb(listener.totalSpillDisk.get())},"error":${err.fold("null")(e => "\"" + e.replaceAll("[\"\\\\\n\r]", " ") + "\"")},"sf":"$sfDir"}"""
      println(line)
      if (listener.perStage != null) listener.perStage.synchronized {
        listener.perStage.toSeq.sortBy(-_._2.totDurMs).take(12).foreach {
          case (id, a) =>
            val nm = listener.stageNames.getOrElse(id, "?")
            System.err.println(f"[stage $id%4d] tasks=${a.n}%4d " +
              f"dur(max/tot)=${a.maxDurMs / 1000.0}%.1f/${a.totDurMs / 1000.0}%.1fs " +
              f"write(max/tot)=${mb(a.maxWrite)}%.1f/${mb(a.totWrite)}%.1fMB " +
              f"read(max/tot)=${mb(a.maxRead)}%.1f/${mb(a.totRead)}%.1fMB " +
              f"spill=${mb(a.spill)}%.1fMB  $nm")
        }
      }
    }
    spark.stop()
  }
}

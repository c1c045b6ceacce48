package graft
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Local-iteration profiler: `runMain graft.Profile q_a [q_b ...]` runs
  * each named query twice (cold + warm) with the Bench session config
  * and prints, for the WARM rep, the Spark-side job/stage/task counts,
  * summed task time, and result-serialization time — the breakdown
  * graft.Time doesn't offer (the UI is disabled in this harness). The
  * gap between wall and summed-task/cores is driver/planning overhead.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "usage: runMain graft.Profile <query> [query ...]")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (String, AtomicInteger, AtomicLong)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        // tasks usually arrive first and create the cell with a "?"
        // name; merge keeps their counters and fills in the name
        perStage.merge(s.stageInfo.stageId,
          (s.stageInfo.name.take(60), new AtomicInteger, new AtomicLong),
          (old, fresh) => (fresh._1, old._2, old._3))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        val cell = perStage.computeIfAbsent(t.stageId,
          _ => ("?", new AtomicInteger, new AtomicLong))
        cell._2.incrementAndGet()
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          cell._3.addAndGet(m.executorRunTime)
        }
      }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).count() // cold rep: JIT + codegen warm-up
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); gcMs.set(0); perStage.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[profile] $name%-28s wall=$wall%6.2fs " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%5d taskTime=${taskTimeMs.get / 1e3}%7.2fs " +
        f"gc=${gcMs.get / 1e3}%5.2fs")
      import scala.jdk.CollectionConverters._
      val all = sys.env.contains("SPARK_GRAFT_PROFILE_ALL")
      val rows = perStage.asScala.toSeq
      val top = if (all) rows.sortBy(_._1)
        else rows.sortBy { case (_, (_, _, ms)) => -ms.get }.take(6)
      top.foreach { case (id, (nm, n, ms)) =>
        println(f"[profile]   stage $id%4d tasks=${n.get}%4d " +
          f"time=${ms.get / 1e3}%7.2fs  $nm")
      }
    }
    spark.stop()
  }
}

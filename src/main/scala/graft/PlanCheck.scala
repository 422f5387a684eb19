package graft
/** Scratch diagnostic main (not part of the library surface).
  *
  * Usage: runMain graft.PlanCheck <entry>[,<entry>...] <sfDir> [reps]
  *
  * Prints each entry's exchanges/joins, then per rep: wall seconds plus the
  * CONTENTION-INDEPENDENT execution profile (jobs, stages, tasks, input
  * bytes read, shuffle bytes written) — the numbers that prove or refute a
  * "fewer passes / fewer shuffles" claim on a noisy machine. A
  * comma-separated entry list shares one JVM/session so a sweep does not
  * pay sbt+session startup per entry.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)

    import org.apache.spark.scheduler._
    import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val input = new AtomicLong; val swrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          swrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
    })

    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    args(0).split(',').foreach { name =>
      val e = SparkEntry.allEntries.find(_.name == name).get
      val df = e.fn(spark, args(1))
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
        .foreach(l => println(s"EXCH[$name]: " + l.trim.take(200)))
      plan.linesIterator.filter(l => l.contains("Join") || l.contains("BroadcastExchange"))
        .foreach(l => println(s"JOIN[$name]: " + l.trim.take(160)))
      spark.catalog.clearCache()

      (1 to reps).foreach { i =>
        Seq(jobs, stages, tasks).foreach(_.set(0)); Seq(input, swrite).foreach(_.set(0))
        val t0 = System.nanoTime()
        e.fn(spark, args(1)).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener events are posted asynchronously; give the bus a moment
        Thread.sleep(500)
        println(f"$name ${args(1)} rep$i: $wall%.2f s  " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"inputMB=${input.get / 1e6}%.1f shufWriteMB=${swrite.get / 1e6}%.2f")
      }
    }
    spark.stop()
  }
}

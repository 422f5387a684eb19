package graft
/** Scratch diagnostic main (not part of the library surface). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    val e = SparkEntry.allEntries.find(_.name == args(0)).get
    val df = e.fn(spark, args(1))
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => println("EXCH: " + l.trim.take(200)))
    plan.linesIterator.filter(l => l.contains("Join") || l.contains("BroadcastExchange"))
      .foreach(l => println("JOIN: " + l.trim.take(160)))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      e.fn(spark, args(1)).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"${args(0)} ${args(1)} rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

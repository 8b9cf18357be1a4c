package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.{Sessions, SparkEntry}

/** Cold-vs-steady profile of ONE registered query (VERDICT r10 #7's
  * q251 cold-path question): run the query N times in a fresh JVM,
  * print per-rep wall seconds plus, for the COLD rep, the per-job wall
  * and summed task time from a listener — separating driver-side cost
  * (plan/compile: wall outside any job) from executor work (jobs), and
  * first-touch materialization (rep-1-only jobs) from steady-state.
  *
  * Usage: sbt "runMain graft.tools.ColdProbe <queryName> [sfDir] [reps]".
  */
object ColdProbe {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q251_entity_resolution")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-cold")
    val fn = SparkEntry.queries.toMap.apply(name)

    val jobWall = mutable.LinkedHashMap[Int, (Long, Long)]() // id → (t0, t1)
    val stageTask = mutable.LinkedHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobWall(e.jobId) = (e.time, 0L)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobWall.get(e.jobId).foreach { case (t0, _) =>
          jobWall(e.jobId) = (t0, e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stageTask(i.stageId) =
          (i.name.takeWhile(_ != '\n').take(60),
            i.taskMetrics.executorRunTime)
      }
    })

    for (r <- 1 to reps) {
      jobWall.clear(); stageTask.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val jobs = jobWall.values.map { case (a, b) => (b - a) / 1e3 }.toSeq
      val inJobs = jobs.sum
      println(f"rep=$r wall=$wall%.2f s in-jobs=$inJobs%.2f s " +
        f"driver-side=${wall - inJobs}%.2f s jobs=${jobs.size}")
      if (r == 1 || r == reps) {
        println(s"  job walls (s): " +
          jobs.map(j => f"$j%.2f").mkString(", "))
        val top = stageTask.toSeq.sortBy(-_._2._2).take(8)
        top.foreach { case (id, (nm, ms)) =>
          println(f"  stage $id%4d task-time=${ms / 1e3}%8.2f s  $nm")
        }
      }
      if (r < reps) { /* keep caches: steady-state like Bench min-of-2 */ }
      if (r == reps - 1) spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: best-of-2 timing of a single query at the bench scale.
  *
  * With SPARK_GRAFT_STAGE_SPREAD set, the SECOND (steady) run also
  * prints a per-stage table — tasks, p50/max task ms, total task ms,
  * input MB read and shuffle MB written — the same audit surface
  * ScaleSmoke grew in r14, here for the GATED sf0.1 rows. Structural
  * leaf re-scans show up directly: two stages with near-identical
  * input MB both reading the same leaf is the cdc_pipeline_e2e /
  * data_budget_cut signature the r14 audits fixed.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = if (args.nonEmpty) args(0) else "dedup_embedding_cosine"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/embeddings.parquet").groupBy().count().collect()

    val audit = sys.env.contains("SPARK_GRAFT_STAGE_SPREAD")
    // (stageId, taskMs, inputBytes, shuffleWriteBytes) per task
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    if (audit) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null && t.taskMetrics != null)
            tasks.add((t.stageId, t.taskInfo.duration,
              t.taskMetrics.inputMetrics.bytesRead,
              t.taskMetrics.shuffleWriteMetrics.bytesWritten))
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          // the short name is usually a generic thread-pool frame —
          // attribute the stage to the first repo frame in its call
          // stack so the table names OUR operator, not the executor
          val repoFrame = sc.stageInfo.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("TimeOne"))
            .map(_.trim).getOrElse(sc.stageInfo.name.takeWhile(_ != '\n'))
          stageNames.put(sc.stageInfo.stageId, repoFrame)
        }
      })

    val times = (1 to 2).map { i =>
      if (audit && i == 2) tasks.clear() // audit the steady run only
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name best=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    if (audit) {
      Thread.sleep(1500) // drain the async listener bus
      val byStage = tasks.toArray(Array.empty[(Int, Long, Long, Long)])
        .groupBy(_._1).toSeq.map { case (sid, ts) =>
          val ds = ts.map(_._2).sorted
          (sid, ts.length, ds(ds.length / 2), ds.last, ds.sum,
            ts.map(_._3).sum / 1e6, ts.map(_._4).sum / 1e6)
        }.sortBy(-_._5)
      println("[timeone] steady-run stages by total task ms:")
      byStage.foreach { case (sid, n, p50, mx, tot, inMb, shMb) =>
        println(f"  stage $sid%5d: $n%4d tasks  p50 $p50%6d  max $mx%6d  " +
          f"total $tot%8d ms  input $inMb%8.1f MB  shufW $shMb%8.1f MB  " +
          s"${stageNames.getOrDefault(sid, "?")}")
      }
    }
    spark.stop()
  }
}

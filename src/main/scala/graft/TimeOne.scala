package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: best-of-2 timing of a single query at the bench scale. */
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
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name best=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}

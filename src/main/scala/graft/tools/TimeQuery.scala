package graft.tools

import org.apache.spark.sql.SparkSession

/** Times SparkEntry queries (comma-separated, sequential in ONE JVM — so
  * shared per-JVM state like the LSH index memo is exercised the same way the
  * bench sweep exercises it):
  * sbt "runMain graft.tools.TimeQuery <name>[,<name>…] <sfDir> [cores]" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n  = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEQUERY $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one SparkEntry query: sbt "runMain graft.tools.TimeQuery <name> <sfDir> [cores]" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n  = graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"TIMEQUERY $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}

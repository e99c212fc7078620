package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a harness query's rows (debugging aid): name[,name…] [sfDir] [rows]. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val nRows = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"== $name @ $sfDir")
      graft.SparkEntry.queries(name)(spark, sfDir).show(nRows, truncate = false)
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` of SparkEntry queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <name>[,<name>…] [sfDir] [cores]"
  *
  * Uses the SAME session shape as Bench (local[cores], shuffle.partitions =
  * cores, AQE on) so the dumped plan is the plan the bench actually runs.
  * Iterative drivers execute their layout/superstep jobs during construction;
  * the dump then shows the final composed plan, which for lazy-chain drivers
  * (bfs/katz/mis/…) is the whole superstep chain.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names  = args(2).split(",").toSeq
    val sfDir  = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cores  = if (args.length > 4) args(4) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

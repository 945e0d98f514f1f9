package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: for each named registry query, splits wall time
  * into compile (DataFrame construction, incl. KQL parse + catalog) and
  * execute (noop-sink write), over N repeats. Usage:
  *   Profile <sfDir> <repeats> <query...>      — time split
  *   Profile <sfDir> explain <query>           — formatted physical plan
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = graft.SparkEntry.queries
    if (args(1) == "explain") {
      registry(args(2))(spark, sfDir).explain("formatted")
      return
    }
    val repeats = args(1).toInt
    val names = args.drop(2)
    names.foreach { name =>
      val fn = registry(name)
      for (i <- 1 to repeats) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$name%-26s rep$i compile=${(t1 - t0) / 1e9}%.3fs exec=${(t2 - t1) / 1e9}%.3fs")
      }
    }
    spark.stop()
  }
}

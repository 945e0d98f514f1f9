package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale stress harness: synthesizes an N-row corpus with `spark.range`
  * (distributed generation — no driver materialization, no test-data
  * dependency) and times the core curation operators on it. The point is
  * the SHAPE of the numbers, not the numbers: doubling N should roughly
  * double each time (linear operators), driver memory stays flat, and
  * nothing collects row data.
  *
  * Run: SPARK_GRAFT_STRESS_N=5000000 sbt "runMain graft.Stress"
  * Prints one JSON line per op: {"op":…,"n":…,"sec":…}.
  */
object Stress {

  /** Deterministic synthetic documents: ~40-token texts drawn from a small
    * vocabulary by hashing (id, position) — same id ⇒ same text, duplicate
    * texts injected every 1000 ids for the dedup paths.
    */
  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocabSize = 5000
    val docBase = spark.range(n).toDF("doc_id")
      // duplicates: every 1000th doc repeats doc 0's text seedwise
      .withColumn("seed", when(col("doc_id") % 1000 === 0, lit(0L))
        .otherwise(col("doc_id")))
    docBase.withColumn("text",
      concat_ws(" ",
        transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"),
            pmod(xxhash64(col("seed"), i), lit(vocabSize)).cast("string")))))
      .drop("seed")
  }

  def synthEvents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("event_id")
      .withColumn("user_id", pmod(xxhash64(col("event_id")), lit(100000L)))
      .withColumn("ts", timestamp_seconds(
        lit(1700000000L) + pmod(xxhash64(col("event_id"), lit(1)), lit(86400L * 30))))
      .withColumn("value",
        (pmod(xxhash64(col("event_id"), lit(2)), lit(10000L)) / 100.0))

  private def time(name: String, n: Long)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"op":"$name","n":$n,"sec":$sec%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STRESS_N", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = synthDocs(spark, n)
    val events = synthEvents(spark, n)

    time("exact_dedup", n) {
      graft.functions.Dedup.exactDupGroups(docs, "doc_id", "text")
    }
    time("repetition_kernel", n) {
      docs.select(col("doc_id"),
        graft.functions.TextAnalysis.repetitionSignals(col("text")).as("r"))
    }
    time("repetition_exploded", n / 10) { // shuffle-bound twin: run at n/10
      graft.functions.TextAnalysis.repetitionFeatures(
        docs.filter(col("doc_id") < n / 10), "doc_id", "text")
    }
    time("quality", n) {
      docs.select(col("doc_id"),
        graft.functions.TextAnalysis.qualityFeatures(col("text")).as("q"))
    }
    time("simhash", n) {
      docs.select(col("doc_id"),
        graft.functions.Dedup.simhash(
          graft.functions.TextAnalysis.tokens(col("text"))).as("sh"))
    }
    time("packing", n) {
      graft.functions.Packing.packSequences(
        docs.select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text"))
            .cast("bigint").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048L)
    }
    time("minhash_lsh", n / 10) { // candidate-pair op: run at n/10
      graft.functions.Dedup.minhashDupPairs(
        docs.filter(col("doc_id") < n / 10), "doc_id", "text")
    }
    time("rolling_window", n) {
      graft.functions.Temporal.rollingWindow(
        events, "user_id", "ts", 3600L, "value")
    }
    time("sessionize", n) {
      graft.functions.Sessionize.sessions(
        events, "user_id", "ts", gapSeconds = 1800L, valueCol = "value")
    }
    spark.stop()
  }
}

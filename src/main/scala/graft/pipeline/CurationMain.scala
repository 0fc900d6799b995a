package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Capstone batch job: the training-data curation pipeline composed from
  * the engine's operators — exact dedup → near-dup pruning (MinHash+LSH)
  * → quality filtering → language ID → token accounting — writing a
  * curated corpus plus a per-stage report. Every stage is the same
  * shuffle-bounded operator the catalog gates; this main is the "run your
  * 100 TB corpus through it" entry point.
  *
  * Usage: runMain graft.pipeline.CurationMain <docsParquet> <outDir>
  */
object CurationMain {

  final case class StageCount(stage: String, docs: Long)

  def curate(spark: SparkSession, docs: DataFrame,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9,
      jaccardThreshold: Double = 0.85): (DataFrame, Seq[StageCount]) = {
    val stages = scala.collection.mutable.ArrayBuffer[StageCount]()
    stages += StageCount("input", docs.count())

    // 1. exact dedup (content fingerprint, keep min id). Each stage is
    // materialized eagerly via localCheckpoint: downstream stages read the
    // blocks instead of re-running the lineage, and the blocks self-free
    // through the ContextCleaner once unreachable — callers never need
    // clearCache() to keep the storage tab flat (PipelineOpsSpec asserts
    // this empties after GC).
    val exact = Dedup.dropExactDups(docs, "doc_id", "text")
      .localCheckpoint(true)
    stages += StageCount("exact_dedup", exact.count())

    // 2. near-dup pruning: drop the higher id of each MinHash-verified pair
    val nearPairs = Dedup.minHashLshPairs(exact, "doc_id", "text",
      n = 3, numPerm = 32, bands = 8, threshold = jaccardThreshold)
    val losers = nearPairs.select(col("id2").as("doc_id")).distinct()
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    stages += StageCount("near_dedup", deduped.count())

    // 3. quality gate + language ID + token accounting
    val scored = TextAnalysis.withLangId(
      TextAnalysis.withQuality(deduped))
    val curated = scored
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    stages += StageCount("quality_gate", curated.count())
    (curated, stages.toSeq)
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.pipeline.CurationMain <docsParquet> <outDir>")
      sys.exit(2)
    }
    val Array(in, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (curated, stages) = curate(spark, spark.read.parquet(in))
    curated.write.mode("overwrite").parquet(s"$outDir/curated")
    stages.toDF().coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/report")
    stages.foreach(s => println(f"[curate] ${s.stage}%-14s ${s.docs}%8d docs"))
    val langs = curated.groupBy("lang_pred").count().orderBy("lang_pred")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    println(s"[curate] languages: $langs")
    spark.stop()
  }
}

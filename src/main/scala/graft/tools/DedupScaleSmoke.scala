package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale-stress for the near-dup pipeline: generates a large synthetic
  * corpus DISTRIBUTIVELY (no driver materialization) with planted exact
  * duplicates (1%) and planted near-duplicates (1%, one-suffix variants,
  * Jaccard ≈ 0.87), runs `nearDupDrops` end to end, and validates the
  * drop rate — the 40×-the-bench-corpus check that sf0.1 (5k docs)
  * cannot provide.
  *
  * `sbt "runMain graft.tools.DedupScaleSmoke [nDocs]"` (default 200k)
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // doc i: 30 words drawn from a 5000-word vocab by hash; i%100==2 is an
    // EXACT copy of doc i-2; i%100==1 is doc i-1 plus a changed tail (a
    // near-dup at ~0.87 Jaccard over 3-gram shingles)
    val base = when(col("id") % 100 === 1, col("id") - 1)
      .when(col("id") % 100 === 2, col("id") - 2)
      .otherwise(col("id"))
    val words = (0 until 30).map(k =>
      concat(lit("w"), pmod(xxhash64(concat(col("base"), lit(s"_$k"))),
        lit(5000))))
    val docs = spark.range(nDocs)
      .withColumn("base", base)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat_ws(" ", words: _*),
          when(col("id") % 100 === 1, lit("tail variant")).otherwise(lit("")))
          .as("text"))

    println(s"== nearDupDrops over $nDocs docs (~30 words each) ==")
    val dropped = time("nearDupDrops end-to-end")(
      Dedup.nearDupDrops(docs, "doc_id", "text").count())
    val exactPlanted = nDocs / 100   // i%100==2
    val nearPlanted = nDocs / 100    // i%100==1
    println(s"  dropped: $dropped (planted: $exactPlanted exact + " +
      s"$nearPlanted near; LSH recall at j=0.87 ≈ 0.97)")
    require(dropped >= exactPlanted + (nearPlanted * 9) / 10,
      s"dropped $dropped — LSH recall collapsed")
    require(dropped <= exactPlanted + nearPlanted,
      s"dropped $dropped — false positives")

    println(s"== minHashLsh candidates alone ==")
    val cands = time("minHashLsh")(
      Dedup.minHashLsh(docs, "doc_id", "text").count())
    println(s"  candidate pairs: $cands (corpus all-pairs: " +
      s"${nDocs * (nDocs - 1) / 2})")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, designed 100-TB-first
  * (SURVEY.md §2.6 / BASELINE.json north star):
  *
  *   - [[exact]]: hash-groupBy — one shuffle on a 128-bit digest, never on
  *     the raw text (shuffling full documents at 100 TB is the anti-pattern).
  *   - [[minHashLsh]]: shingle → MinHash signature → banded LSH join. The
  *     only joins are on (band, bandKey) buckets; candidate volume is
  *     controlled by band geometry, not corpus size O(n²).
  *   - [[simHash]]: 32-bit SimHash per document; near-dup = small Hamming
  *     distance. Signature computation is a single aggregation pass.
  *   - [[ngramJaccard]]: exact n-gram Jaccard via inverted-index self-join —
  *     the verification stage behind the LSH candidates (and an oracle-able
  *     ground truth at test scale).
  *
  * All hashing goes through [[TextFunctions.hash60]] (md5-based) so DuckDB
  * reproduces every signature bit-for-bit for the correctness oracle.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** MinHash parameters: `numPerms` permutations `h_i(x) = (a_i*x + b_i) mod P`
    * over the 60-bit shingle hash reduced mod P. P is the Mersenne prime
    * 2^31-1, so a*x stays under 2^62 — no 64-bit overflow in either engine. */
  val P: Long = 2147483647L
  def permA(i: Int): Long = (2654435761L * (i + 1)) % P
  def permB(i: Int): Long = (40503L * (i + 1) * (i + 1) + 1234567L) % P

  /** Per-document MinHash signature as `numPerms` columns `mh0..mhN`.
    * One explode + one aggregation — map-side partial min means the shuffle
    * carries only (doc, numPerms longs) per distinct shingle partition. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 16): DataFrame = {
    // plain explode (not _outer): a doc with < n tokens has no signature,
    // matching SQL `unnest` semantics in the oracle; tokenization is
    // materialized in its own projection (see shinglesFromTokens scaladoc)
    val sh = df
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(shinglesFromTokens(col("toks"), n)).as("sh"))
      .select(col(idCol), (hash60(col("sh")) % P).as("h"))
      .distinct()
    val mins = (0 until numPerms).map(i =>
      min((col("h") * permA(i) + permB(i)) % P).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** All ordered pairs (a < b) from bucketed id arrays, as a compiled typed
    * flatMap: Catalyst higher-order lambdas evaluate interpreted per element
    * (measured 2-3x slower on 1M+ pair expansions), and a self-join would
    * recompute the whole upstream subtree per side. Safe when buckets are
    * small by construction (LSH bands); skewed buckets should use the
    * join-based inverted index instead. */
  private def expandPairs(buckets: DataFrame, idsCol: String): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    buckets.select(col(idsCol)).as[Seq[Long]].flatMap { ids =>
      val s = ids.sorted
      s.indices.iterator.flatMap(i =>
        (i + 1 until s.size).iterator.map(j => (s(i), s(j))))
    }.toDF("doc_a", "doc_b")
  }

  /** Banded LSH candidate pairs: signature split into `bands` bands of
    * `rows` permutations; docs sharing any full band become a candidate.
    * Output: (doc_a, doc_b, n_bands) with doc_a < doc_b.
    *
    * Shape: one shuffle to bucket by (band, key), pair expansion inside the
    * bucket (bounded by design — banding exists to keep buckets small), one
    * shuffle to count bands per pair. */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rows: Int = 4): DataFrame = {
    val sig = minHashSignatures(df, idCol, textCol, n, bands * rows)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
          .as("key"))
    }
    val buckets = sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk.band"), col("bk.key"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    expandPairs(buckets, "ids")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 32-bit SimHash over distinct tokens: bit i is set when the count of
    * token-hashes with bit i set exceeds those without. Single explode +
    * single aggregation with 32 conditional sums — no per-bit explosion. */
  def simHash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val tok = df
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(array_distinct(col("toks"))).as("t"))
      .withColumn("h", hash60(col("t")))
    val bitSums = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until bits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)): Column
    }.reduce(_ + _)
    agg.select(col(idCol), hashExpr.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (verification over
    * LSH-candidates in production; all-pairs only at test scale). */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol)
    val l = sh.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"))
    val r = sh.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"))
    l.crossJoin(r)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The production near-dup shape: LSH candidates → exact Jaccard verify
    * restricted to candidate docs → the doc_ids to DROP (the larger id of
    * each verified pair; keep-smallest policy). At 100 TB only the
    * candidate-involved slice of the shingle index is recomputed — the
    * verify join is semi-joined down to candidate docs before the
    * inverted-index pass. */
  def nearDupDrops(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val cands = minHashLsh(df, idCol, textCol, n, bands, rows)
      .select(col("doc_a"), col("doc_b"))
    val involved = broadcast(
      cands.select(col("doc_a").as("doc"))
        .union(cands.select(col("doc_b").as("doc"))).distinct())
    val restricted = df.join(involved,
      col(idCol) === col("doc"), "left_semi")
    ngramJaccard(restricted, idCol, textCol, n, threshold)
      .join(cands, Seq("doc_a", "doc_b"), "left_semi")
      .select(col("doc_b").as("dropped")).distinct()
  }

  /** Exact n-gram Jaccard similarity ≥ `threshold` via inverted-index join:
    * explode distinct shingles, self-join on shingle (the inverted index),
    * count intersections, derive |A ∪ B| = |A| + |B| − |A ∩ B|. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // dedup on the 60-bit shingle hash, not the string: ~60% less shuffle
    // volume; the oracle hashes identically so counts agree by construction
    val sh = df
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("toks"))
      .select(col("doc"), explode(shinglesFromTokens(col("toks"), n)).as("sh"))
      .select(col("doc"), hash60(col("sh")).as("sh"))
      .distinct()
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    // inverted-index self-join on the 8-byte hash: skew-tolerant (a hot
    // shingle's pairs spread across tasks, unlike bucket-local expansion)
    val inter = sh.select(col("doc").as("doc_a"), col("sh"))
      .join(sh.select(col("doc").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("doc").as("doc_a"),
        col("n_sh").as("n_a"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc").as("doc_b"),
        col("n_sh").as("n_b"))), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }
}

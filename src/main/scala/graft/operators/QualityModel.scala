package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression,
  LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based quality filtering — the GPT-3/LLaMA-pipeline classifier
  * (Brown et al. 2020, appendix A; Touvron et al. 2023 §2): a logistic
  * regression trained to separate REFERENCE documents from raw-crawl
  * documents on cheap surface features, then applied corpus-wide so
  * every document gets P(reference-like) as its quality score.
  *
  * Spark-first shape:
  *   - features are the narrow per-doc quality signals the engine
  *     already computes ([[TextFunctions.qualityStruct]] +
  *     [[TextFunctions.gopherStruct]] ratios) — one codegen'd
  *     projection, no shuffle;
  *   - training runs on a BOUNDED labeled frame (at 100 TB: the
  *     reference set plus an equal-size [[Curation.hashSample]] of the
  *     crawl — never the corpus; the sf corpora are already bounded so
  *     the demo trains on them whole);
  *   - scoring is `model.transform` — MLlib broadcasts the coefficient
  *     vector, the pass stays narrow.
  *
  * Determinism: L-BFGS over a deterministic feature frame from a fixed
  * zero init; the spec pins coefficient stability across retrains and
  * perfect separation on a linearly-separable planted corpus. */
object QualityModel {

  val featureCols: Seq[String] = Seq("n_tokens", "punct_ratio",
    "stop_ratio", "avg_token_len", "symbol_ratio", "bullet_frac",
    "ellipsis_frac", "alpha_frac")

  /** Narrow per-doc feature projection (no shuffle, no UDF). */
  def featurize(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol), col(textCol).as("text"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        TextFunctions.qualityStruct(col("text")).as("q"),
        TextFunctions.gopherStruct(col("text"), col("toks")).as("g"))
      .select(col(idCol),
        col("q.n_tokens").cast("double").as("n_tokens"),
        col("q.punct_ratio"), col("q.stop_ratio"),
        col("q.avg_token_len"), col("g.symbol_ratio"),
        col("g.bullet_frac"), col("g.ellipsis_frac"),
        col("g.alpha_frac"))

  private def assemble(features: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("features").transform(features)

  /** Train the reference-vs-crawl classifier on a labeled feature frame
    * (`labelCol` ∈ {0.0, 1.0}; 1 = reference). */
  def train(labeled: DataFrame, labelCol: String)
      : LogisticRegressionModel =
    new LogisticRegression().setFeaturesCol("features")
      .setLabelCol(labelCol).setMaxIter(50).setRegParam(1e-4)
      .fit(assemble(labeled))

  /** Score a corpus: adds `quality_prob` = P(reference-like). */
  def score(features: DataFrame, model: LogisticRegressionModel,
      idCol: String): DataFrame = {
    val scored = model.transform(assemble(features))
    val p = udfFreeProb(scored)
    p.select(col(idCol), col("quality_prob"))
  }

  /** Extract P(class=1) from MLlib's probability vector without a UDF:
    * `vector_to_array` is a built-in (mllib functions). */
  private def udfFreeProb(scored: DataFrame): DataFrame =
    scored.withColumn("quality_prob",
      round(get(org.apache.spark.ml.functions
        .vector_to_array(col("probability")), lit(1)), 4))

  /** A fixed-iteration batch-gradient-descent twin of [[train]] whose
    * every arithmetic step is ANSI-replayable — the oracle-able trainer
    * (the L-BFGS fit above is production-grade but its line search is
    * not SQL-unrollable; this twin is, via one CTE pair per iteration).
    *
    * Shape: the labeled frame is cut to a DETERMINISTIC bounded sample
    * (lowest `sampleSize` ids — at oracle scale the corpus is ≤ 2048
    * docs so sample ≡ corpus, the lloydCtes precedent; at 100 TB use
    * [[Curation.hashSample]] upstream and pass the result in whole),
    * collected ordered (≤ 2048 × 9 doubles on the driver), features are
    * z-scored on the sample (population std; sd < 1e-12 guard → 1,
    * epsilon-matched with the oracle — see the stds comment below),
    * and `iters` full-batch steps run from a zero init:
    * `w ← w − lr · avg((σ(w·z) − y) · z)`. Driver-side sums are
    * left-assoc in ascending-id order; DuckDB's `avg` associates
    * differently — the ~1e-13 double drift is absorbed by the caller's
    * output rounding, exactly the lloydCtes caveat. */
  case class GdModel(means: Array[Double], stds: Array[Double],
      intercept: Double, weights: Array[Double])

  def trainGd(labeled: DataFrame, idCol: String, labelCol: String,
      iters: Int = 10, lr: Double = 0.5, sampleSize: Int = 2048)
      : GdModel = {
    val rows = labeled
      .select((Seq(col(idCol)) ++ featureCols.map(col) :+
        col(labelCol).cast("double")): _*)
      .orderBy(col(idCol)).limit(sampleSize)
      .collect()
    val n = rows.length
    require(n > 0, "trainGd: empty training frame")
    val d = featureCols.length
    val x = Array.tabulate(n, d)((i, j) => rows(i).getDouble(j + 1))
    val y = Array.tabulate(n)(i => rows(i).getDouble(d + 1))
    val means = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < n) { s += x(i)(j); i += 1 }
      s / n
    }
    val stds = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < n) {
        val dev = x(i)(j) - means(j); s += dev * dev; i += 1
      }
      val sd = math.sqrt(s / n)
      // epsilon, not == 0: a constant feature gives sd EXACTLY 0 under
      // DuckDB's Welford stddev_pop but ~1e-16 under these two-pass
      // sums — an equality guard would branch on one engine only. Both
      // sides compare < 1e-12 so (near-)constant features take the
      // guard together (gdOracle carries the matching CASE).
      if (sd < 1e-12) 1.0 else sd
    }
    val z = Array.tabulate(n, d)((i, j) => (x(i)(j) - means(j)) / stds(j))
    var b = 0.0
    val w = new Array[Double](d)
    for (_ <- 1 to iters) {
      var gb = 0.0
      val g = new Array[Double](d)
      var i = 0
      while (i < n) {
        var dot = b; var j = 0
        while (j < d) { dot += w(j) * z(i)(j); j += 1 }
        val err = 1.0 / (1.0 + math.exp(-dot)) - y(i)
        gb += err
        j = 0
        while (j < d) { g(j) += err * z(i)(j); j += 1 }
        i += 1
      }
      b -= lr * (gb / n)
      var j = 0
      while (j < d) { w(j) -= lr * (g(j) / n); j += 1 }
    }
    GdModel(means, stds, b, w)
  }

  /** Score a corpus with a [[trainGd]] model: the weights fold in as
    * LITERALS, so the whole pass is one narrow codegen'd projection —
    * no broadcast, no UDF, no MLlib vector boxing. Adds `quality_prob`
    * rounded to 4 (which also absorbs the cross-engine double drift of
    * the unrolled oracle). */
  def scoreGd(features: DataFrame, model: GdModel, idCol: String)
      : DataFrame = {
    val margin = featureCols.zipWithIndex.foldLeft(
      lit(model.intercept)) { case (acc, (c, j)) =>
      acc + lit(model.weights(j)) *
        ((col(c) - lit(model.means(j))) / lit(model.stds(j)))
    }
    features.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 4).as("quality_prob"))
  }
}

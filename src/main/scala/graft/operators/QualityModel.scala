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
}

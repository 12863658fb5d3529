package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One front door for the health of ANY persisted graft store — the
  * pager for an operator who inherits a directory and does not know
  * (or does not trust the runbook about) which family wrote it.
  * [[detectStoreKind]] reads the LAYOUT, not metadata that could lie:
  * the families are distinguishable from the resolved generation's
  * child datasets and, for the flat ledgers, one parquet schema
  * footer — no data bytes are read.
  *
  *   - `centroids/` + `assigned/`            → `ivf`
  *   - `centroids/` + `codebooks/` + `codes/`→ `ivf_pq`
  *   - `centroids/` + `codes/`               → `ivf_sq8`
  *   - `codebooks/` + `codes/`               → `pq`
  *   - `codes/` alone                        → `sq8`
  *   - `epoch-NNNNNNNNNNNN/` child dirs      → `admit_epochs`
  *     (a streamed-admit epoch root — [[Dedup.admitEpochHealthReport]])
  *   - flat rows with `hs` + `mh*` signatures → `neardup_ledger`
  *   - flat rows with only digest columns    → `dedup_ledger`
  *   - flat rows with `band`/`kh` keys       → `neardup_bands`
  *     (the near-dup ledger's sibling store — health is reported for
  *     the ledger PAIR, so the dispatcher redirects to the primary)
  *
  * [[storeHealthReport]] then routes to the family's existing report
  * verb and prepends a `store_kind` column, so the first column of the
  * one-pager says what the directory IS. Only the path-only layout
  * reports are dispatched here — the drift/recall monitors need a
  * corpus/batch frame no path can supply and stay family-specific.
  * Unknown or empty layouts fail LOUDLY with what was actually found:
  * a health tool that shrugs is how a mislabeled store stays
  * mislabeled. */
object StoreHealth {

  /** Detect which family wrote the store at `path` (or a generation
    * dir of it — resolve is the identity there). Driver-side listing
    * plus at most one parquet schema read. */
  def detectStoreKind(spark: SparkSession, path: String): String = {
    if (!graft.util.Gen.hasData(spark, path)) return "empty"
    val g = graft.util.Gen.resolve(spark, path)
    val fs = new org.apache.hadoop.fs.Path(g)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def has(d: String) =
      fs.exists(new org.apache.hadoop.fs.Path(g, d))
    if (has("centroids")) {
      if (has("codebooks") && has("codes")) "ivf_pq"
      else if (has("assigned")) "ivf"
      else if (has("codes")) "ivf_sq8"
      else "unknown"
    } else if (has("codebooks") && has("codes")) "pq"
    else if (has("codes")) "sq8"
    else if (fs.listStatus(new org.apache.hadoop.fs.Path(g)).exists(st =>
      st.isDirectory && st.getPath.getName.matches("epoch-\\d+")))
      "admit_epochs" // a streamed-admit epoch root (never versioned)
    else {
      // flat dataset: one schema footer decides among the ledgers
      val cols = graft.util.Gen.read(spark, g).columns.toSet
      if (cols.contains("hs") && cols.contains("mh0")) "neardup_ledger"
      else if (cols.contains("band") && cols.contains("kh"))
        "neardup_bands"
      else if (cols.contains("text_md5")) "dedup_ledger"
      else "unknown"
    }
  }

  /** Route to the family's layout health report, `store_kind` first.
    * A `_bands`-suffixed near-dup band store redirects to its primary
    * (the pair is one ledger — [[Dedup.nearDupLedgerHealthReport]]
    * already audits both sides and their row-count invariant). */
  def storeHealthReport(spark: SparkSession, path: String): DataFrame = {
    val kind = detectStoreKind(spark, path)
    val report = kind match {
      case "ivf" => Similarity.ivfIndexStats(spark, path)
      case "ivf_pq" => Similarity.ivfPqIndexStats(spark, path)
      case "ivf_sq8" => Similarity.ivfSq8IndexStats(spark, path)
      case "pq" => Similarity.pqIndexStats(spark, path)
      case "sq8" => Similarity.sq8IndexStats(spark, path)
      case "dedup_ledger" => Dedup.dedupLedgerStats(spark, path)
      case "admit_epochs" => Dedup.admitEpochHealthReport(spark, path)
      case "neardup_ledger" => Dedup.nearDupLedgerHealthReport(spark, path)
      case "neardup_bands" =>
        // the pair's primary derives from the store root — the path
        // itself, or (for a generation dir handed straight in) its
        // parent; a renamed/copied band store has no derivable pair
        val bandsRoot =
          if (path.endsWith("_bands")) Some(path)
          else Option(new org.apache.hadoop.fs.Path(path).getParent)
            .map(_.toString).filter(_.endsWith("_bands"))
        bandsRoot match {
          case Some(b) => Dedup.nearDupLedgerHealthReport(spark,
            b.stripSuffix("_bands"))
          case None => throw new IllegalArgumentException(
            s"storeHealthReport: $path is a near-dup BAND store " +
              "whose ledger primary cannot be derived from the path " +
              "(the pair lives at <primary> and <primary>_bands) — " +
              "pass the ledger primary path; its report audits both " +
              "stores")
        }
      case other =>
        throw new IllegalArgumentException(
          s"storeHealthReport: $path is not a recognizable graft " +
            s"store (detected '$other') — expected an IVF/PQ/SQ8 " +
            "index layout (centroids/codebooks/codes/assigned), a " +
            "dedup ledger (text_md5 digests), or a near-dup ledger " +
            "(signature rows / band keys). For a bare generation " +
            "census use Gen.generationCensus.")
    }
    report.select(lit(kind).as("store_kind") +: report.columns
      .map(col): _*)
  }
}

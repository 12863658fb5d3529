package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned GENERATION layout for every persisted store — the
  * zero-reader-outage successor to [[Fs.swapRewrite]]'s two-rename
  * window.
  *
  * Layout: a store at `P` holds its data inside numbered generation
  * dirs, `P/gen-00000001`, `P/gen-00000002`, … Exactly one file makes
  * a generation REAL: `gen-N/_gen_commit`, created only after the
  * generation's datasets are fully written (the leading underscore
  * keeps Spark/parquet readers from treating it as data). Readers
  * resolve `P` to its highest COMMITTED generation once per load
  * ([[resolve]]); maintenance (save-over, compaction, rebuild, forget)
  * writes the NEXT generation and creates its commit marker as the
  * single atomic publish step ([[rewrite]]) — there is never a moment
  * when the store path does not exist, so the documented swapRewrite
  * reader outage (and its rename-is-copy object-store caveat — a
  * marker CREATE is atomic everywhere, including S3A) both disappear.
  *
  * Reader grace: the previous generation is NOT deleted at publish
  * time. A reader that resolved before the flip keeps a valid path
  * until the NEXT rewrite sweeps it (one full maintenance cycle of
  * grace — tune with [[sweepGenerations]] if disk pressure demands
  * eager reclaim, after in-flight readers quiesce). Transient disk
  * cost is the same 2× a swapRewrite held during its window, held for
  * a cycle instead.
  *
  * Crash safety, by construction:
  *   - a crash mid-write leaves an UNCOMMITTED `gen-N` dir that no
  *     resolve ever returns (the commit marker is the last write) and
  *     the next rewrite sweeps;
  *   - the maintenance marker (`P_maintenance`, shared spelling with
  *     [[Fs.swapRewrite]]) goes down before the snapshot read and
  *     comes up after the publish, so ingest writers — which call
  *     [[Fs.failIfUnderMaintenance]] first — fail loudly for the
  *     window instead of appending rows into a generation the flip is
  *     about to obsolete; a crash leaves the marker down (ingest stays
  *     fenced) and a RE-RUN of the rewrite recovers and clears it;
  *   - the check-then-act residue (an ingest that passed its fence
  *     check just before the marker went down and commits during the
  *     rewrite) is closed by a RECURSIVE content-summary re-verify
  *     (file count + byte count of the current generation, captured
  *     after the marker, re-checked before the commit marker is
  *     created) — a slipped append aborts the publish with the old
  *     generation still current, and nothing is lost.
  *
  * Ingest ([[appendDir]]) writes into the CURRENT generation — an
  * append-only mutation readers tolerate by definition (they just see
  * more rows), exactly like appending to a flat store.
  *
  * Legacy flat stores (written before this layout existed) resolve to
  * themselves and keep working; their first [[rewrite]] MIGRATES them
  * — one last [[Fs.swapRewrite]] whose payload is `gen-00000001`
  * (documented one-time outage), versioned forever after. */
object Gen {

  private val GenPrefix = "gen-"
  private[graft] val CommitMarker = "_gen_commit"

  private[graft] def genDirName(n: Long): String = f"$GenPrefix$n%08d"

  private def parseGen(name: String): Option[Long] =
    if (name.startsWith(GenPrefix))
      name.stripPrefix(GenPrefix).toLongOption
    else None

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (gen number, committed?) for every `gen-*` child of `store`,
    * ascending. Empty for flat/missing stores. */
  private def gens(fs: FileSystem, store: Path): Seq[(Long, Boolean)] =
    if (!fs.exists(store)) Seq.empty
    else fs.listStatus(store).toSeq
      .flatMap(s => parseGen(s.getPath.getName).map(n =>
        (n, fs.exists(new Path(s.getPath, CommitMarker)))))
      .sortBy(_._1)

  /** Resolve a store path to the directory a READER should scan: the
    * highest committed generation when versioned, the path itself when
    * flat/legacy (or empty). One or two namenode RPCs; call once per
    * load, not per expression. Deliberately ignores maintenance
    * markers — readers are never fenced. */
  def resolve(spark: SparkSession, storePath: String): String = {
    val store = new Path(storePath)
    val committed = gens(fsOf(spark, store), store).filter(_._2)
    if (committed.isEmpty) storePath
    else new Path(store, genDirName(committed.last._1)).toString
  }

  /** Does the store hold any readable data? Versioned: a committed
    * generation with at least one non-hidden entry. Flat: any
    * non-hidden entry. Uncommitted generations never count. */
  def hasData(spark: SparkSession, storePath: String): Boolean = {
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    if (!fs.exists(store)) return false
    val gs = gens(fs, store)
    val dataDir =
      if (gs.isEmpty) store
      else gs.filter(_._2).lastOption match {
        case Some((n, _)) => new Path(store, genDirName(n))
        case None => return false
      }
    fs.exists(dataDir) && fs.listStatus(dataDir).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** The directory an INGEST append should write into: the current
    * generation (versioned), the path itself (legacy flat store with
    * data), or a freshly-established empty `gen-00000001` (new store —
    * committed immediately: an empty generation receiving appends is
    * indistinguishable from a committed one receiving appends, and
    * versioned-from-birth means the store's first compaction is
    * already zero-outage). Callers fence with
    * [[Fs.failIfUnderMaintenance]] BEFORE calling, per the ingest
    * contract. */
  def appendDir(spark: SparkSession, storePath: String): String = {
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    val gs = gens(fs, store)
    val committed = gs.filter(_._2)
    if (committed.nonEmpty)
      new Path(store, genDirName(committed.last._1)).toString
    else if (gs.isEmpty && fs.exists(store) &&
        fs.listStatus(store).nonEmpty)
      storePath // legacy flat store
    else {
      // never adopt an EXISTING uncommitted dir: it is a crashed
      // write's partial content, and committing it would publish
      // half-written data — establish a FRESH generation number above
      // it instead (the orphan sweeps at the next rewrite)
      val g = new Path(store,
        genDirName(gs.map(_._1).maxOption.getOrElse(0L) + 1))
      fs.mkdirs(g)
      fs.create(new Path(g, CommitMarker), true).close()
      g.toString
    }
  }

  private[graft] def createMarker(spark: SparkSession,
      storePath: String): Unit = {
    val m = new Path(Fs.maintenanceMarkerPath(storePath))
    fsOf(spark, m).create(m, true).close()
  }

  private[graft] def deleteMarker(spark: SparkSession,
      storePath: String): Unit = {
    val m = new Path(Fs.maintenanceMarkerPath(storePath))
    fsOf(spark, m).delete(m, false)
  }

  /** Recursive (file count, byte count) of a directory — the
    * re-verify snapshot. Unlike a direct-children listing this SEES an
    * append that lands nested inside a partition subdir or a
    * tombstones dir (dir names and lengths do not change on HDFS/S3A
    * when files appear inside them). */
  private def summary(fs: FileSystem, dir: Path): Option[(Long, Long)] =
    if (!fs.exists(dir)) None
    else {
      val cs = fs.getContentSummary(dir)
      Some((cs.getFileCount, cs.getLength))
    }

  /** Rewrite a store as a NEW GENERATION with zero reader outage —
    * the shared maintenance protocol behind every save-over /
    * compaction / rebuild / forget. `writeTo` receives the next
    * generation's directory and must fully materialize the new store
    * content there; the commit marker created afterwards is the
    * atomic publish. See the object scaladoc for the full protocol.
    *
    * `ownsMarker = true` is for callers that hold the store's
    * maintenance marker THEMSELVES across a larger critical section
    * (the near-dup forget spans two stores under the primary's
    * marker): the rewrite then neither creates nor deletes it, and a
    * failure leaves it down — the caller decides when the compound
    * operation is complete. */
  def rewrite(spark: SparkSession, storePath: String,
      ownsMarker: Boolean = false)(writeTo: String => Unit): Unit = {
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    // cross-level fencing, same rules as swapRewrite: an enclosing
    // dir's rewrite owns this store; a child store mid-rewrite inside
    // this dir (or inside the current generation) must not be swept
    // out from under its own maintenance
    Option(store.getParent)
      .map(p => new Path(Fs.maintenanceMarkerPath(p.toString)))
      .filter(fs.exists).foreach { m =>
        throw new IllegalStateException(
          s"Gen.rewrite: enclosing directory of $storePath is under " +
            s"maintenance ($m exists) — retry after it completes (or " +
            "re-run IT if it crashed)")
      }
    def innerMarkers(dir: Path): Seq[String] =
      if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory)
        fs.listStatus(dir).toSeq.map(_.getPath.getName)
          .filter(_.endsWith("_maintenance"))
      else Seq.empty
    val cur0 = gens(fs, store).filter(_._2).lastOption.map(_._1)
    val inner = innerMarkers(store) ++
      cur0.toSeq.flatMap(n => innerMarkers(new Path(store, genDirName(n))))
    if (inner.nonEmpty)
      throw new IllegalStateException(
        s"Gen.rewrite: $storePath contains maintenance markers " +
          s"(${inner.mkString(", ")}) — a store inside it is " +
          "mid-rewrite (or crashed mid-rewrite); finish/re-run that " +
          "rewrite first")
    if (!ownsMarker) createMarker(spark, storePath)
    def lift(): Unit = if (!ownsMarker) deleteMarker(spark, storePath)
    locally {
      val gs = gens(fs, store)
      if (gs.isEmpty && fs.exists(store) &&
          fs.listStatus(store).nonEmpty) {
        // LEGACY FLAT STORE — migrate through one last swapRewrite
        // (documented one-time reader outage): the payload is the
        // store's first generation, committed inside the temp dir so
        // the promoting rename publishes data and marker together.
        // swapRewrite manages the same marker path itself; release
        // ours first so its create/delete does not fight the
        // protocol (and re-assert it afterwards for ownsMarker
        // callers mid-compound-operation).
        if (!ownsMarker) deleteMarker(spark, storePath)
        Fs.swapRewrite(spark, storePath) { tmp =>
          val g = new Path(tmp, genDirName(1))
          writeTo(g.toString)
          fs.create(new Path(g, CommitMarker), true).close()
        }
        if (ownsMarker) createMarker(spark, storePath)
        return
      }
      // sweep: uncommitted generations (crashed writes) and committed
      // generations older than current (their reader grace ended when
      // THIS rewrite started)
      val cur = gs.filter(_._2).lastOption.map(_._1)
      gs.foreach { case (n, committed) =>
        if (!committed || cur.exists(n < _))
          fs.delete(new Path(store, genDirName(n)), true)
      }
      val curDir = cur.map(n => new Path(store, genDirName(n)))
      val pre = curDir.flatMap(summary(fs, _))
      val next = new Path(store, genDirName(cur.getOrElse(0L) + 1))
      try writeTo(next.toString)
      catch {
        case e: Throwable =>
          // nothing was published: the current generation is intact,
          // so surface the failure instead of leaving ingest fenced
          fs.delete(next, true)
          lift()
          throw e
      }
      if (curDir.flatMap(summary(fs, _)) != pre) {
        fs.delete(next, true)
        lift()
        throw new IllegalStateException(
          s"Gen.rewrite: $storePath changed while the rewrite ran (an " +
            "ingest slipped through the fence's check-then-act " +
            "window) — the publish was aborted with the old " +
            "generation still current; re-run to include the new rows")
      }
      fs.create(new Path(next, CommitMarker), true).close() // publish
      lift()
      // a sweep/summary IO failure above deliberately leaves the
      // marker down — the store's state is unverified, and a fenced
      // ingest beats a silently-lost one; re-running the rewrite
      // recovers and clears it
    }
  }

  /** Resolve a SPECIFIC committed generation — the pinned-read form
    * behind reproducible serving and A/B across a rebuild: a job that
    * records `currentGeneration` at deploy time keeps serving exactly
    * that index through later compactions/rebuilds (for as long as its
    * generation survives the sweep policy — pair with
    * [[sweepGenerations]]' `keepLast`), and an operator can diff the
    * pre- and post-rebuild indexes by loading both generations. The
    * returned dir is stable: every `load*` verb accepts it directly in
    * place of the store path (resolving a generation dir is the
    * identity). Fails loudly on a missing or uncommitted generation —
    * a pinned reader must never silently fall forward. */
  def resolveAt(spark: SparkSession, storePath: String,
      generation: Long): String = {
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    gens(fs, store).find(_._1 == generation) match {
      case Some((n, true)) => new Path(store, genDirName(n)).toString
      case Some((_, false)) => throw new IllegalStateException(
        s"Gen.resolveAt: generation $generation of $storePath exists " +
          "but is UNCOMMITTED (a crashed or in-flight rewrite) — it " +
          "holds no publishable data")
      case None => throw new IllegalStateException(
        s"Gen.resolveAt: $storePath has no generation $generation " +
          "(swept, or never written) — list generations with " +
          "Gen.generationCensus")
    }
  }

  /** The current committed generation number, if the store is
    * versioned. */
  def currentGeneration(spark: SparkSession,
      storePath: String): Option[Long] = {
    val store = new Path(storePath)
    gens(fsOf(spark, store), store).filter(_._2).lastOption.map(_._1)
  }

  /** One row per generation dir — the observability surface for the
    * versioned layout: (generation, committed, current, n_files,
    * bytes). Uncommitted rows are crashed/in-flight rewrites (swept by
    * the next rewrite); non-current committed rows are reader-grace
    * copies [[sweepGenerations]] can reclaim. Driver-side listing
    * only — no Spark job. */
  def generationCensus(spark: SparkSession,
      storePath: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    val gs = gens(fs, store)
    val cur = gs.filter(_._2).lastOption.map(_._1)
    gs.map { case (n, committed) =>
      val cs = fs.getContentSummary(new Path(store, genDirName(n)))
      (n, committed, committed && cur.contains(n),
        cs.getFileCount, cs.getLength)
    }.toDF("generation", "committed", "current", "n_files", "bytes")
  }

  /** Eagerly drop old committed generations, keeping the newest
    * `keepLast` (≥ 1) plus any uncommitted dirs a live rewrite may be
    * writing. For operators who cannot wait for the next rewrite's
    * sweep to reclaim disk — only safe once in-flight readers of the
    * old generations have quiesced. Returns the number of generation
    * dirs removed. */
  def sweepGenerations(spark: SparkSession, storePath: String,
      keepLast: Int = 1): Int = {
    require(keepLast >= 1, "keepLast must be ≥ 1")
    val store = new Path(storePath)
    val fs = fsOf(spark, store)
    val committed = gens(fs, store).filter(_._2).map(_._1)
    val drop = committed.dropRight(keepLast)
    drop.foreach(n => fs.delete(new Path(store, genDirName(n)), true))
    drop.size
  }
}

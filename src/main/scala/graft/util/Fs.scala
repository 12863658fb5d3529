package graft.util

import java.nio.file.{Files, Path, Paths}

/** Tiny filesystem helpers shared by the temp-index lifecycles (t52's
  * driver entry, ExplainCheck's DPP probe, the DAG-resume spec). */
object Fs {

  /** The shared maintenance-rewrite protocol for an on-disk parquet
    * store a Spark job wants to rewrite in place (IVF cell-store
    * compaction, dedup-ledger compaction): `writeTo` materializes the
    * rewrite into a sibling `<store>_compacting` dir (a Spark job
    * cannot safely overwrite the directory it is reading), then the
    * swap runs as two renames through the store's own Hadoop
    * FileSystem — store → `<store>_old`, compacted → store, delete
    * old. Each rename is an atomic metadata op on POSIX/HDFS. Crash
    * safety: a prior run that died between its renames left the store
    * missing and `<store>_old` holding the only original copy — a
    * RE-RUN restores it before the cleanup deletes touch anything
    * (deleting first would destroy both surviving copies). A failed
    * promote rolls the first rename back, and the rollback result is
    * CHECKED — if it also fails (e.g. a concurrent writer recreated
    * the store) the exception says where both copies actually are.
    * SINGLE MAINTENANCE WRITER — now ENFORCED, not just documented: a
    * `<store>_maintenance` marker file goes down BEFORE the snapshot
    * read and comes up only after the swap completes, and every
    * in-repo ingest writer ([[graft.operators.Similarity]] appends,
    * [[graft.operators.Dedup]] ledger admits) calls
    * [[failIfUnderMaintenance]] first — an append racing a compaction
    * now fails LOUDLY instead of being silently dropped by the swap.
    * A compaction that crashes mid-run leaves the marker in place (so
    * ingest stays fenced off the half-swapped store) and a re-run
    * clears it after recovering the rename state. READERS are not
    * fenced: between the two renames the store path does not exist,
    * so a concurrent reader (an index serve, a ledger anti-join) hits
    * path-not-found for that window — quiesce reads for the rewrite,
    * or serve through an indirection (versioned dirs + pointer flip)
    * on deployments that cannot. On rename-is-copy object stores
    * prefer versioned dirs + a pointer flip outright. */
  def swapRewrite(spark: org.apache.spark.sql.SparkSession,
      storePath: String)(writeTo: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val store = new Path(storePath)
    val tmp = new Path(storePath + "_compacting")
    val old = new Path(storePath + "_old")
    val marker = new Path(maintenanceMarkerPath(storePath))
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fence FIRST — before the crash recovery and long before the
    // snapshot read inside writeTo; create(overwrite=true) also makes a
    // re-run over a crashed compaction's surviving marker a no-op
    fs.create(marker, true).close()
    if (!fs.exists(store) && fs.exists(old) && !fs.rename(old, store))
      throw new java.io.IOException(
        s"swapRewrite: $store is missing and restoring $old failed — " +
          "recover manually before re-running")
    fs.delete(tmp, true)
    fs.delete(old, true)
    writeTo(tmp.toString)
    if (!fs.rename(store, old))
      throw new java.io.IOException(
        s"swapRewrite: could not move $store aside")
    if (!fs.rename(tmp, store)) {
      val restored = fs.rename(old, store)
      throw new java.io.IOException(
        if (restored)
          s"swapRewrite: could not promote $tmp; original restored"
        else
          s"swapRewrite: could not promote $tmp AND rollback failed — " +
            s"original at $old, compacted at $tmp, store state unknown")
    }
    fs.delete(old, true)
    fs.delete(marker, false)
  }

  /** Sibling path of the maintenance marker [[swapRewrite]] holds for
    * the rewrite window. */
  def maintenanceMarkerPath(storePath: String): String =
    storePath + "_maintenance"

  /** The ingest-side half of the maintenance fence: every writer that
    * appends to a swapRewrite-maintained store calls this first and
    * fails loudly while a compaction window (or a crashed compaction's
    * surviving marker) is open — the alternative is rows committed
    * after the snapshot read being silently dropped by the swap, the
    * one failure mode that LOSES data. */
  def failIfUnderMaintenance(spark: org.apache.spark.sql.SparkSession,
      storePath: String, who: String): Unit = {
    import org.apache.hadoop.fs.Path
    val store = new Path(storePath)
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // check the store's own marker AND the enclosing directory's: a
    // whole-index rewrite (rebuildIvfIndex swaps the index DIR, not one
    // dataset under it) fences every dataset it contains
    val markers = Seq(Some(store), Option(store.getParent)).flatten
      .map(p => new Path(maintenanceMarkerPath(p.toString)))
    markers.find(fs.exists).foreach { m =>
      throw new IllegalStateException(
        s"$who: $storePath is under maintenance ($m exists) — a " +
          "compaction/rebuild is running (rows appended now would be " +
          "silently dropped by its swap) or crashed mid-run (re-run it " +
          "to recover and clear the marker); retry after it completes")
    }
  }

  /** Recursive delete, a no-op when `dir` does not exist. The
    * `Files.walk` stream holds open DirectoryStreams and MUST be
    * closed — leaking it accumulates directory handles on every
    * bench rep / verify pass (the reason this lives in one place
    * instead of three copy-pasted blocks). */
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }
}

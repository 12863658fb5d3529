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
    * SINGLE MAINTENANCE WRITER required: rows committed to the store
    * by a concurrent writer after `writeTo` snapshots it are silently
    * dropped by the swap — pause ingest for the rewrite window. On
    * rename-is-copy object stores prefer versioned dirs + a pointer
    * flip instead. */
  def swapRewrite(spark: org.apache.spark.sql.SparkSession,
      storePath: String)(writeTo: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val store = new Path(storePath)
    val tmp = new Path(storePath + "_compacting")
    val old = new Path(storePath + "_old")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
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

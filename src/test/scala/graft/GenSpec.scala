package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.util.Gen

/** Pins the versioned-generation store protocol ([[graft.util.Gen]]) —
  * the zero-reader-outage successor to swapRewrite that every persisted
  * store's lifecycle verbs route through:
  *   - a reader that resolved BEFORE a rewrite's flip completes
  *     correctly against its generation (the concurrent-reader spec);
  *   - resolution never lands on a partial generation (the commit
  *     marker is the last write), and orphaned generations are swept
  *     (the crash spec);
  *   - legacy flat stores migrate on their first rewrite and are
  *     versioned forever after;
  *   - ingest appends land in the CURRENT generation or fail loudly at
  *     the maintenance fence, and an append that slips the fence's
  *     check-then-act window aborts the publish (content re-verify). */
class GenSpec extends SparkTestBase {
  import SparkTestBase.session.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("id", "v")

  test("create + resolve: a fresh rewrite writes gen-1, resolve returns " +
      "it, hasData sees it; an uncommitted generation is invisible") {
    val root = tmp("graft_gen_create")
    val store = s"$root/store"
    try {
      assert(!Gen.hasData(spark, store))
      assert(Gen.resolve(spark, store) === store) // missing → itself
      Gen.rewrite(spark, store)(g =>
        rows(4, "a").write.parquet(g))
      val g1 = Gen.resolve(spark, store)
      assert(g1 === s"$store/gen-00000001")
      assert(Gen.hasData(spark, store))
      assert(spark.read.parquet(g1).count() === 4L)
      // a partial (uncommitted) generation: resolve and hasData ignore
      // it — the commit marker IS the publish
      fs.mkdirs(new Path(s"$store/gen-00000002"))
      fs.create(new Path(s"$store/gen-00000002/part-junk.parquet"),
        true).close()
      assert(Gen.resolve(spark, store) === g1)
      assert(Gen.hasData(spark, store)) // still: the COMMITTED gen
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("concurrent reader: a DataFrame resolved before the flip " +
      "completes against ITS generation after the rewrite publishes — " +
      "zero reader outage; new resolves see the new generation") {
    val root = tmp("graft_gen_reader")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(6, "old").write.parquet(g))
      // the reader resolves ONCE (the load* contract) and holds a lazy
      // plan over that generation
      val preFlip = spark.read.parquet(Gen.resolve(spark, store))
      assert(preFlip.count() === 6L)
      // maintenance publishes a NEW generation while the reader is
      // "in flight" (its plan unexecuted)
      Gen.rewrite(spark, store)(g => rows(3, "new").write.parquet(g))
      // the pre-flip reader completes correctly against the OLD
      // generation (kept for reader grace until the NEXT rewrite)
      assert(preFlip.count() === 6L)
      assert(preFlip.select("v").as[String].collect()
        .forall(_.startsWith("old")))
      // a fresh resolve serves the new generation
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 3L)
      // ...and the next rewrite sweeps the old generation (grace over)
      Gen.rewrite(spark, store)(g => rows(2, "next").write.parquet(g))
      assert(!fs.exists(new Path(s"$store/gen-00000001")))
      assert(fs.exists(new Path(s"$store/gen-00000002"))) // new grace
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 2L)
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("crash protocol: a rewrite that dies mid-write leaves an orphan " +
      "no resolve returns and a marker that fences ingest; the re-run " +
      "sweeps, publishes, and clears") {
    val root = tmp("graft_gen_crash")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(5, "a").write.parquet(g))
      // simulate the crash: partial next generation + surviving marker
      fs.mkdirs(new Path(s"$store/gen-00000002"))
      Gen.createMarker(spark, store)
      assert(Gen.resolve(spark, store) === s"$store/gen-00000001")
      intercept[IllegalStateException] {
        graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      }
      // re-run: sweeps the orphan (its NUMBER is reusable — no resolve
      // ever returned it), publishes a fresh committed gen-2, clears
      // the marker
      Gen.rewrite(spark, store)(g => rows(5, "b").write.parquet(g))
      val g2 = Gen.resolve(spark, store)
      assert(g2 === s"$store/gen-00000002")
      assert(fs.exists(new Path(s"$g2/${"_gen_commit"}")))
      assert(spark.read.parquet(g2).select("v").as[String].collect()
        .forall(_.startsWith("b")))
      graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      // a failed writeTo lifts its own marker (store untouched — a
      // transient job failure must not become an ingest outage)
      val boom = intercept[RuntimeException] {
        Gen.rewrite(spark, store)(_ =>
          throw new RuntimeException("transient"))
      }
      assert(boom.getMessage === "transient")
      graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      assert(Gen.resolve(spark, store) === g2)
      // crash AFTER the commit flip but BEFORE the marker lift: the
      // publish already happened (readers serve the new generation),
      // ingest stays fenced, and a maintenance re-run converges — one
      // extra (identical-content) cycle, marker cleared
      Gen.createMarker(spark, store)
      assert(Gen.resolve(spark, store) === g2) // readers unaffected
      intercept[IllegalStateException] {
        graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      }
      Gen.rewrite(spark, store)(g =>
        spark.read.parquet(Gen.resolve(spark, store)).write.parquet(g))
      graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .select("v").as[String].collect().forall(_.startsWith("b")))
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("slipped ingest: an append committing into the current " +
      "generation DURING a rewrite aborts the publish with the old " +
      "generation still current and the marker lifted") {
    val root = tmp("graft_gen_slip")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(4, "a").write.parquet(g))
      val cur = Gen.resolve(spark, store)
      val slipped = intercept[IllegalStateException] {
        Gen.rewrite(spark, store) { g =>
          // bypasses the fence — the check-then-act residue
          rows(1, "slip").write.mode("append").parquet(cur)
          spark.read.parquet(cur).limit(2).write.parquet(g)
        }
      }
      assert(slipped.getMessage.contains("changed while the rewrite ran"))
      assert(Gen.resolve(spark, store) === cur)
      // nothing lost: the slipped rows are in the still-current
      // generation, and ingest is not fenced
      assert(spark.read.parquet(cur).count() === 5L)
      graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      // the re-run (the error's remediation) includes the new rows
      Gen.rewrite(spark, store)(g =>
        spark.read.parquet(Gen.resolve(spark, store)).write.parquet(g))
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 5L)
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("legacy flat store: resolve/appendDir pass through; the first " +
      "rewrite MIGRATES to the versioned layout (one-time outage) and " +
      "later rewrites are generation flips") {
    val root = tmp("graft_gen_legacy")
    val store = s"$root/store"
    try {
      rows(3, "flat").write.parquet(store) // a pre-Gen store
      assert(Gen.resolve(spark, store) === store)
      assert(Gen.hasData(spark, store))
      assert(Gen.appendDir(spark, store) === store)
      Gen.rewrite(spark, store)(g =>
        rows(3, "flat").write.parquet(g))
      assert(Gen.resolve(spark, store) === s"$store/gen-00000001")
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 3L)
      Gen.rewrite(spark, store)(g =>
        rows(7, "v2").write.parquet(g))
      assert(Gen.resolve(spark, store) === s"$store/gen-00000002")
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 7L)
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("appendDir: establishes a committed gen-1 for a fresh store so " +
      "ingest-born stores are versioned from birth; appends land in " +
      "the current generation") {
    val root = tmp("graft_gen_append")
    val store = s"$root/store"
    try {
      val d1 = Gen.appendDir(spark, store)
      assert(d1 === s"$store/gen-00000001")
      rows(2, "b1").write.mode("append").parquet(d1)
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 2L)
      rows(3, "b2").write.mode("append")
        .parquet(Gen.appendDir(spark, store))
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 5L)
      // after a rewrite, appends land in the NEW generation
      Gen.rewrite(spark, store)(g =>
        spark.read.parquet(Gen.resolve(spark, store))
          .write.parquet(g))
      assert(Gen.appendDir(spark, store) === s"$store/gen-00000002")
      // a crashed FIRST write's uncommitted gen dir is never adopted:
      // committing it would publish half-written data — a fresh store
      // whose only gen dir is an orphan gets a NEW generation number
      val store2 = s"$root/store2"
      fs.mkdirs(new Path(s"$store2/gen-00000001"))
      fs.create(new Path(s"$store2/gen-00000001/part-junk.parquet"),
        true).close()
      val d2 = Gen.appendDir(spark, store2)
      assert(d2 === s"$store2/gen-00000002")
      rows(1, "x").write.mode("append").parquet(d2)
      assert(spark.read.parquet(Gen.resolve(spark, store2))
        .count() === 1L)
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("pinned reads: resolveAt serves a SPECIFIC committed generation " +
      "through later rewrites, refuses uncommitted/missing ones, and " +
      "generationCensus reports the layout") {
    val root = tmp("graft_gen_pin")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(4, "v1").write.parquet(g))
      val pinned = Gen.currentGeneration(spark, store).get
      assert(pinned === 1L)
      // maintenance moves the store forward...
      Gen.rewrite(spark, store)(g => rows(9, "v2").write.parquet(g))
      // ...but the pinned resolve still serves the deploy-time
      // generation (reader grace: one maintenance cycle by default)
      val atPin = Gen.resolveAt(spark, store, pinned)
      assert(spark.read.parquet(atPin).count() === 4L)
      // a generation dir resolves to itself — every load* verb accepts
      // it directly in place of the store path
      assert(Gen.resolve(spark, atPin) === atPin)
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 9L)
      // census: one row per generation, current flagged
      val census = Gen.generationCensus(spark, store)
        .orderBy(col("generation")).collect()
      assert(census.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(census.map(_.getBoolean(2)).toSeq === Seq(false, true))
      assert(census.forall(_.getBoolean(1)))
      assert(census.forall(_.getLong(4) > 0L))
      // an uncommitted generation: census shows it, resolveAt refuses
      fs.mkdirs(new Path(s"$store/gen-00000003"))
      val c2 = Gen.generationCensus(spark, store)
        .filter(col("generation") === 3L).first()
      assert(!c2.getBoolean(1))
      intercept[IllegalStateException] {
        Gen.resolveAt(spark, store, 3L)
      }
      intercept[IllegalStateException] {
        Gen.resolveAt(spark, store, 42L)
      }
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("sweepGenerations reclaims old committed generations eagerly, " +
      "keeping the newest keepLast") {
    val root = tmp("graft_gen_sweep")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(1, "a").write.parquet(g))
      Gen.rewrite(spark, store)(g => rows(2, "b").write.parquet(g))
      // gen-1 (grace) + gen-2 (current) exist; an eager sweep drops
      // gen-1 without waiting for the next rewrite
      assert(fs.exists(new Path(s"$store/gen-00000001")))
      assert(Gen.sweepGenerations(spark, store) === 1)
      assert(!fs.exists(new Path(s"$store/gen-00000001")))
      assert(spark.read.parquet(Gen.resolve(spark, store))
        .count() === 2L)
      assert(Gen.sweepGenerations(spark, store) === 0)
    } finally graft.util.Fs.deleteRecursively(root)
  }

  test("ownsMarker: the compound-operation form neither creates nor " +
      "lifts the caller's marker — a failure between two store " +
      "rewrites leaves ingest fenced until the re-run completes") {
    val root = tmp("graft_gen_owns")
    val store = s"$root/store"
    try {
      Gen.rewrite(spark, store)(g => rows(2, "a").write.parquet(g))
      Gen.createMarker(spark, store)
      // the rewrite runs under the CALLER's marker...
      Gen.rewrite(spark, store, ownsMarker = true)(g =>
        rows(2, "b").write.parquet(g))
      // ...and leaves it down afterwards (the caller decides when the
      // compound operation is complete)
      intercept[IllegalStateException] {
        graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      }
      // a failure inside ALSO leaves it down
      intercept[RuntimeException] {
        Gen.rewrite(spark, store, ownsMarker = true)(_ =>
          throw new RuntimeException("mid-compound failure"))
      }
      intercept[IllegalStateException] {
        graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
      }
      Gen.deleteMarker(spark, store)
      graft.util.Fs.failIfUnderMaintenance(spark, store, "ingest")
    } finally graft.util.Fs.deleteRecursively(root)
  }
}

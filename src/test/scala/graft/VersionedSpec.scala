package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.lake.{LakeWriter, Versioned}

/** Version-pointer table layout: gap-free publishes, crash-orphan
  * tolerance, vacuum retention, and the in-place swap's recovery path.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString + "/tbl"

  test("publish/read roundtrip; repoint is atomic and monotonic") {
    val root = tmpRoot("versioned")
    val v1 = Versioned.publish(Seq(1, 2, 3).toDF("x"), root)
    assert(v1 === 1)
    assert(Versioned.read(spark, root).as[Int].collect().sorted === Array(1, 2, 3))
    // the pointer file exists from first publish onward — there is no
    // instant where the table resolves to a missing directory
    assert(Files.exists(Paths.get(root, "_CURRENT")))
    val v2 = Versioned.publish(Seq(4, 5).toDF("x"), root)
    assert(v2 === 2 && Versioned.currentVersion(root) === Some(2))
    assert(Versioned.read(spark, root).as[Int].collect().sorted === Array(4, 5))
    // previous version untouched until vacuum: a reader that resolved the
    // pointer before the repoint still has a complete directory
    assert(Files.isDirectory(Paths.get(root, "v000001")))
  }

  test("crashed publish leaves an orphan that readers never see") {
    val root = tmpRoot("versioned-orphan")
    Versioned.publish(Seq(1).toDF("x"), root)
    // simulate a writer that died after creating its version dir but
    // before repointing: a half-written directory above the pointer
    Files.createDirectories(Paths.get(root, "v000002"))
    Files.write(Paths.get(root, "v000002", "part-junk.parquet"), Array[Byte](1, 2))
    assert(Versioned.currentVersion(root) === Some(1))
    assert(Versioned.read(spark, root).as[Int].collect() === Array(1))
    // next publish allocates ABOVE the orphan (never reuses its dir)
    val v = Versioned.publish(Seq(2).toDF("x"), root)
    assert(v === 3)
    assert(Versioned.read(spark, root).as[Int].collect() === Array(2))
    // vacuum reclaims both the old version and the orphan
    val removed = Versioned.vacuum(root, keep = 1)
    assert(removed === 2)
    assert(!Files.exists(Paths.get(root, "v000001")))
    assert(!Files.exists(Paths.get(root, "v000002")))
    assert(Versioned.read(spark, root).as[Int].collect() === Array(2))
  }

  test("vacuum keeps the live version plus retention window") {
    val root = tmpRoot("versioned-vacuum")
    (1 to 4).foreach(i => Versioned.publish(Seq(i).toDF("x"), root))
    val removed = Versioned.vacuum(root, keep = 2)
    assert(removed === 2) // v1, v2 gone; v3 retained for in-flight readers
    assert(Files.isDirectory(Paths.get(root, "v000003")))
    assert(Versioned.read(spark, root).as[Int].collect() === Array(4))
  }

  test("versioned compact collapses files with zero reader-visible gap") {
    val root = tmpRoot("versioned-compact")
    Versioned.publish(
      spark.range(10000).select($"id".cast("int").as("x")).repartition(16), root)
    val before = Versioned.read(spark, root).inputFiles.length
    assert(before >= 16)
    Versioned.compact(spark, root)
    val after = Versioned.read(spark, root)
    assert(after.inputFiles.length < before)
    assert(after.agg(sum($"x")).as[Long].head === 10000L * 9999 / 2)
  }

  test("compact hits the byte target on narrow schemas and keeps pruning stats") {
    // The 100× write-path rehearsal found compact producing 6 × ≤53 MB
    // files against a 256 MB target: the flat 2M-record cap re-split
    // every byte-targeted partition of a narrow schema. compact must
    // derive records-per-file from the table's own bytes/row — files
    // land within [0.5×, 1.3×] of target — and must re-record the live
    // chain's stats columns so readWhere still file-skips afterwards.
    val root = tmpRoot("versioned-compact-target")
    // two deltas, stats on x; many small files (narrow long column)
    Versioned.publishDelta(
      spark.range(0, 300000).select($"id".as("x")).repartition(24), root,
      statsCols = Seq("x"))
    Versioned.publishDelta(
      spark.range(300000, 600000).select($"id".as("x")).repartition(24), root,
      statsCols = Seq("x"))
    val before = Versioned.read(spark, root)
    val beforeBytes = before.inputFiles.map(f =>
      Files.size(Paths.get(new java.net.URI(f)))).sum
    val target = beforeBytes / 3 // force ~3 output files whatever snappy does
    Versioned.compact(spark, root, targetBytes = target)
    val files = Versioned.read(spark, root).inputFiles
    val sizes = files.map(f => Files.size(Paths.get(new java.net.URI(f))))
    assert(files.length <= 4, s"expected ~3 target-sized files, got ${files.length}")
    // no undersized shards: every file at least half the target (the old
    // record-cap bug produced thirds of it)
    assert(sizes.forall(_ >= target / 2),
      s"undersized compacted file: ${sizes.mkString(",")} vs target $target")
    assert(sizes.forall(_ <= (target * 1.4).toLong),
      s"oversized compacted file: ${sizes.mkString(",")} vs target $target")
    // stats survived the fold: a 1000-row slice must not read every file
    val slice = Versioned.readWhere(spark, root, "x", 100, 1099)
    assert(slice.count() === 1000L)
    assert(slice.inputFiles.length < files.length,
      "readWhere stopped file-skipping after compact — stats were dropped")
  }

  test("log table: O(delta) appends, manifest union read, compact folds") {
    val root = tmpRoot("versioned-log")
    Versioned.publishDelta(Seq(1, 2).toDF("x"), root)
    Versioned.publishDelta(Seq(3).toDF("x"), root)
    Versioned.publishDelta(Seq(4, 5).toDF("x"), root)
    assert(Versioned.manifest(root) === Seq(1, 2, 3))
    assert(Versioned.read(spark, root).as[Int].collect().sorted === (1 to 5).toArray)
    // earlier deltas were never rewritten: appends stayed O(delta)
    assert(Files.isDirectory(Paths.get(root, "v000001")))
    // compaction folds the chain into one directory, atomically
    val v = Versioned.compact(spark, root)
    assert(Versioned.manifest(root) === Seq(v))
    assert(Versioned.read(spark, root).as[Int].collect().sorted === (1 to 5).toArray)
    // old deltas reclaimable once no reader window needs them
    assert(Versioned.vacuum(root, keep = 1) === 3)
    assert(Versioned.read(spark, root).as[Int].collect().sorted === (1 to 5).toArray)
    // appends keep working after compaction
    Versioned.publishDelta(Seq(6).toDF("x"), root)
    assert(Versioned.read(spark, root).as[Int].collect().sorted === (1 to 6).toArray)
  }

  test("Z-order layout: files cover rectangles, so either column prunes") {
    import graft.lake.ZOrder
    // uniform 100×100 grid — the worst case for a single-column sort
    val grid = spark.range(10000)
      .select(($"id" % 100).as("x"), ($"id" / 100).cast("long").as("y"))
    val zDir = Files.createTempDirectory("graft-zorder").toString + "/z"
    val linDir = Files.createTempDirectory("graft-zorder").toString + "/lin"
    ZOrder.writeZOrdered(grid, zDir, "x", "y", nFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.parquet(linDir)

    // content is unchanged by the layout
    assert(spark.read.parquet(zDir).count() === 10000L)
    assert(spark.read.parquet(zDir).agg(sum($"x" + $"y")).as[Long].head ===
      grid.agg(sum($"x" + $"y")).as[Long].head)

    // per-file y-ranges: how many files would a y-filter have to read?
    def filesOverlapping(dir: String, lo: Long, hi: Long): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"y"), max($"y")).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    // x-sorted layout: every file spans all of y -> nothing prunes
    assert(filesOverlapping(linDir, 10, 19) === 16)
    // z-order: a 10% y-slice touches a minority of files
    val zTouched = filesOverlapping(zDir, 10, 19)
    assert(zTouched <= 8, s"y-slice touched $zTouched/16 z-ordered files")
    // and x stays prunable too (the trade is symmetric)
    val zTouchedX = {
      val files = new java.io.File(zDir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"x"), max($"x")).head()
        r.getLong(0) <= 19 && r.getLong(1) >= 10
      }
    }
    assert(zTouchedX <= 8, s"x-slice touched $zTouchedX/16 z-ordered files")
  }

  test("stat-pruned reads: z-published table answers range queries from few files") {
    import graft.lake.{Versioned, ZOrder}
    val root = tmpRoot("versioned-stats")
    val grid = spark.range(10000)
      .select(($"id" % 100).as("x"), ($"id" / 100).cast("long").as("y"))
    Versioned.publish(ZOrder.zArrange(grid, "x", "y", nFiles = 16), root,
      statsCols = Seq("x", "y"))
    val pruned = Versioned.readWhere(spark, root, "y", 10, 19)
    val expect = Versioned.read(spark, root)
      .where($"y" >= 10 && $"y" <= 19)
    assert(pruned.inputFiles.length <= 8,
      s"stat pruning opened ${pruned.inputFiles.length}/16 files")
    assert(pruned.agg(sum($"x" + $"y")).as[Long].head ===
      expect.agg(sum($"x" + $"y")).as[Long].head)
    assert(pruned.count() === 1000L)

    // a stats-less delta stays correct (contributes all its files)
    Versioned.publishDelta(Seq((5L, 15L)).toDF("x", "y"), root)
    val pruned2 = Versioned.readWhere(spark, root, "y", 10, 19)
    assert(pruned2.count() === 1001L)
    // and an out-of-range query still sees only the stats-less delta
    assert(Versioned.readWhere(spark, root, "y", 200, 300).count() === 0L)
  }

  test("footer stats: publish computes pruning stats without re-scanning the write") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(600) } // listener bus is async; let it drain
      finally spark.sparkContext.removeSparkListener(l)
      n.get
    }
    val grid = spark.range(2000).select(($"id" % 50).as("x"))
    // stats come from the parquet footers (driver-side metadata), so a
    // stats publish must launch exactly as many jobs as a stat-less one —
    // the old implementation re-read every written file in a second job
    val without = jobsDuring(Versioned.publish(grid, tmpRoot("nostats")))
    val withStats = jobsDuring(
      Versioned.publish(grid, tmpRoot("stats"), statsCols = Seq("x")))
    assert(withStats === without,
      s"stats publish ran $withStats jobs vs $without without stats — " +
        "it must not re-scan the written files")
  }

  test("NaN and all-null stats columns are never wrongly pruned") {
    val root = tmpRoot("versioned-nan")
    // delta 1: a NaN in the stats column ALONGSIDE an in-range value —
    // parquet drops FP min/max for NaN-tainted chunks; the old path
    // recorded max=NaN and the range test (false for NaN) pruned the file
    Versioned.publishDelta(Seq(Double.NaN, 15.0).toDF("y"), root,
      statsCols = Seq("y"))
    // delta 2: all-null stats column (old path fabricated (0.0, 0.0))
    Versioned.publishDelta(
      Seq[Option[Double]](None, None).toDF("y"), root, statsCols = Seq("y"))
    // delta 3: clean values, one in range
    Versioned.publishDelta(Seq(1.0, 12.0).toDF("y"), root,
      statsCols = Seq("y"))
    val got = Versioned.readWhere(spark, root, "y", 10, 20)
      .as[Double].collect().sorted
    assert(got === Array(12.0, 15.0),
      "NaN-tainted file must stay readable (unprunable), nulls must not match")
    // an out-of-range probe that would have matched the fabricated (0,0)
    assert(Versioned.readWhere(spark, root, "y", -1, 0).count() === 0L)
  }

  test("log-table schema evolution: mergeSchema unions added columns") {
    val root = tmpRoot("versioned-evolve")
    Versioned.publishDelta(Seq((1, "a")).toDF("x", "s"), root)
    Versioned.publishDelta(Seq((2, "b", 9.5)).toDF("x", "s", "score"), root)
    val merged = Versioned.read(spark, root, mergeSchema = true)
    assert(merged.columns.sorted === Array("s", "score", "x"))
    val rows = merged.select($"x", $"score").as[(Int, Option[Double])]
      .collect().toMap
    assert(rows === Map(1 -> None, 2 -> Some(9.5)))
  }

  test("time travel: readAsOf replays any retained publish; vacuum is the horizon") {
    val root = tmpRoot("versioned-history")
    Versioned.publish(Seq(1).toDF("x"), root)
    Versioned.publishDelta(Seq(2).toDF("x"), root)
    Versioned.publish(Seq(9).toDF("x"), root) // snapshot rewrite
    assert(Versioned.history(root) === Seq(Seq(1), Seq(1, 2), Seq(3)))
    assert(Versioned.readAsOf(spark, root, 0).as[Int].collect().sorted === Array(1))
    assert(Versioned.readAsOf(spark, root, 1).as[Int].collect().sorted === Array(1, 2))
    assert(Versioned.readAsOf(spark, root, -1).as[Int].collect().sorted === Array(9))
    // vacuum reclaims v1/v2 -> old publishes become unreadable, loudly
    assert(Versioned.vacuum(root, keep = 1) === 2)
    val e = intercept[IllegalStateException] {
      Versioned.readAsOf(spark, root, 0)
    }
    assert(e.getMessage.contains("vacuum"))
    assert(Versioned.readAsOf(spark, root, -1).as[Int].collect() === Array(9))
  }

  test("history survives torn appends and a flip-without-log crash") {
    val root = tmpRoot("versioned-torn")
    Versioned.publish(Seq(1).toDF("x"), root)
    Versioned.publish(Seq(2).toDF("x"), root)
    // torn trailing append (writer died mid-line, no newline)
    java.nio.file.Files.write(Paths.get(root, "_HISTORY"),
      "v0000".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    // the torn line is dropped; live manifest still ends the history
    assert(Versioned.history(root) === Seq(Seq(1), Seq(2)))
    assert(Versioned.readAsOf(spark, root, -1).as[Int].collect() === Array(2))
    // crash BETWEEN pointer flip and append: wipe the log entirely —
    // "-1 = live" must still hold via the virtual final entry
    java.nio.file.Files.delete(Paths.get(root, "_HISTORY"))
    assert(Versioned.history(root) === Seq(Seq(2)))
    assert(Versioned.readAsOf(spark, root, -1).as[Int].collect() === Array(2))
  }

  test("needsCompaction flags long manifests and small files") {
    val root = tmpRoot("versioned-needs")
    assert(!Versioned.needsCompaction(root)) // unpublished: nothing to do
    (1 to 3).foreach(i => Versioned.publishDelta(Seq(i).toDF("x"), root))
    // tiny files trip the mean-file-size signal
    assert(Versioned.needsCompaction(root, maxManifestLen = 8))
    // both signals clear for a compacted table with a generous threshold
    Versioned.compact(spark, root)
    assert(!Versioned.needsCompaction(root, maxManifestLen = 8, minFileBytes = 1L))
    // a single tiny file can't be folded further: the DEFAULT small-file
    // threshold must not demand eternal re-compaction of small tables
    assert(!Versioned.needsCompaction(root, maxManifestLen = 8))
    // manifest-length signal alone
    (1 to 3).foreach(i => Versioned.publishDelta(Seq(i).toDF("x"), root))
    assert(Versioned.needsCompaction(root, maxManifestLen = 3, minFileBytes = 1L))
  }

  test("publishes record observed row counts: exact totals with no scan") {
    val root = tmpRoot("versioned-meta")
    Versioned.publishDelta(spark.range(123).toDF("x"), root)
    assert(Versioned.publishedRows(root) === Some(123L))
    Versioned.publishDelta(spark.range(77).toDF("x"), root)
    assert(Versioned.publishedRows(root) === Some(200L))
    // snapshot publish resets to its own count
    Versioned.publish(spark.range(5).toDF("x"), root)
    assert(Versioned.publishedRows(root) === Some(5L))
    // the count agrees with an actual scan
    assert(Versioned.read(spark, root).count() === 5L)
  }

  test("writer lock: second writer fails fast, readers unaffected, break recovers") {
    val root = tmpRoot("versioned-lock")
    Versioned.publish(Seq(1).toDF("x"), root)
    Versioned.withWriterLock(root) {
      // a concurrent writer is rejected while the lock is held...
      val e = intercept[IllegalStateException] {
        Versioned.withWriterLock(root)(fail("second writer must not enter"))
      }
      assert(e.getMessage.contains("another writer"))
      // ...but readers never block on it
      assert(Versioned.read(spark, root).as[Int].collect() === Array(1))
      Versioned.publish(Seq(2).toDF("x"), root)
    }
    // released on exit: the next writer proceeds
    Versioned.withWriterLock(root)(Versioned.publish(Seq(3).toDF("x"), root))
    assert(Versioned.read(spark, root).as[Int].collect() === Array(3))
    // a failing body propagates its own exception...
    intercept[RuntimeException] {
      Versioned.withWriterLock(root) { throw new RuntimeException("crash") }
    }
    // lock released even on body failure (try/finally) — reacquire works
    Versioned.withWriterLock(root)(())
    // simulate a hard crash that never reached the finally
    java.nio.file.Files.write(
      Paths.get(root, "_WRITER_LOCK"), "dead@nowhere\n".getBytes("UTF-8"))
    intercept[IllegalStateException] { Versioned.withWriterLock(root)(()) }
    assert(Versioned.breakLock(root))
    Versioned.withWriterLock(root)(())
  }

  test("writer lock: a crashed holder's lock auto-expires past the stale horizon") {
    val root = tmpRoot("versioned-lock-stale")
    val lock = Paths.get(root, "_WRITER_LOCK")
    java.nio.file.Files.createDirectories(Paths.get(root))
    java.nio.file.Files.write(lock, "dead@nowhere\n".getBytes("UTF-8"))
    // age the lock file past a 1-second horizon
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 5000L))
    // permanent default still refuses (human must breakLock)...
    intercept[IllegalStateException] { Versioned.withWriterLock(root)(()) }
    // ...a fresh lock under a TTL also refuses (holder presumed live)...
    intercept[IllegalStateException] {
      Versioned.withWriterLock(root, staleAfterMillis = 60000L)(())
    }
    // ...but past the horizon the build-if-absent path self-heals
    var entered = false
    Versioned.withWriterLock(root, staleAfterMillis = 1000L) { entered = true }
    assert(entered)
    // and the re-taken lock was released on exit
    assert(!java.nio.file.Files.exists(lock))
  }

  test("writer lock: heartbeat keeps a LIVE slow holder safe under a finite horizon") {
    val root = tmpRoot("versioned-lock-heartbeat")
    // holder runs well past the horizon; the heartbeat (horizon/3)
    // keeps the lock's mtime fresh, so a mid-body contender with the
    // SAME horizon must fail fast instead of breaking a live writer.
    // generous margins (2 s horizon ⇒ ~666 ms beats, break needs 2 s of
    // heartbeat silence) so co-tenant scheduling delay cannot flake this
    @volatile var contenderBroke = false
    Versioned.withWriterLock(root, staleAfterMillis = 2000L) {
      Thread.sleep(3000L)
      try {
        Versioned.withWriterLock(root, staleAfterMillis = 2000L) {
          contenderBroke = true
        }
      } catch { case _: IllegalStateException => () }
      assert(!contenderBroke,
        "a live holder's lock was stale-broken despite the heartbeat")
    }
    assert(!java.nio.file.Files.exists(Paths.get(root, "_WRITER_LOCK")))
  }

  test("a reader loop never fails while a writer publishes continuously") {
    val root = tmpRoot("versioned-concurrent")
    Versioned.publish(Seq(0).toDF("x"), root)
    // valid observable states: each publish replaces the table with a
    // single row carrying the publish index
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val observed = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val v = Versioned.read(spark, root).as[Int].collect()
          assert(v.length === 1) // never empty, never mixed generations
          observed.add(v.head)
        } catch { case t: Throwable => failures.add(t); stop.set(true) }
      }
    })
    reader.start()
    try (1 to 8).foreach(i => Versioned.publish(Seq(i).toDF("x"), root))
    finally { stop.set(true); reader.join(30000) }
    assert(failures.isEmpty,
      s"reader failed during publishes: ${Option(failures.peek()).map(_.toString)}")
    import scala.jdk.CollectionConverters._
    assert(observed.asScala.nonEmpty &&
      observed.asScala.forall(v => v >= 0 && v <= 8))
  }

  test("recoverSwap heals a crash between the two swap moves") {
    val dir = tmpRoot("swap-crash")
    Seq(1, 2, 3).toDF("x").write.parquet(dir)
    // crash window: old snapshot moved aside, staging never moved in
    Files.move(Paths.get(dir), Paths.get(dir + ".old"),
      StandardCopyOption.ATOMIC_MOVE)
    // plus a stale half-written staging from the dead writer
    Files.createDirectories(Paths.get(dir + ".compacting"))
    Files.write(Paths.get(dir + ".compacting", "junk"), Array[Byte](9))
    LakeWriter.recoverSwap(dir)
    assert(spark.read.parquet(dir).as[Int].collect().sorted === Array(1, 2, 3))
    assert(!Files.exists(Paths.get(dir + ".old")))
    assert(!Files.exists(Paths.get(dir + ".compacting")))
    // crash AFTER the swap completed but before .old cleanup: the new
    // snapshot at path wins, the backup is reclaimed
    Seq(9).toDF("x").write.parquet(dir + ".old")
    LakeWriter.recoverSwap(dir)
    assert(spark.read.parquet(dir).as[Int].collect().sorted === Array(1, 2, 3))
    assert(!Files.exists(Paths.get(dir + ".old")))
  }
}

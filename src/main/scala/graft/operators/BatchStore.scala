package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared crash-safety discipline of the append-only `batch=<id>`
  * partition stores ([[IncrementalDedup]], [[IncrementalSegmentDedup]],
  * [[IncrementalImageDedup]], [[IncrementalSemDedup]], the
  * [[Retrieval]] index trees and [[IvfIndex]]'s cells tree). Until round
  * 10 each store re-implemented batch enumeration, replay exclusion, the
  * `__next` swap, and compaction independently — four copies of the same
  * fixed-point argument, which is exactly how the round-9 store shipped
  * with an implicit (non-structural) replay guarantee. Single-sourcing
  * the invariants here means the next store gets them by construction:
  *
  *  - '''Layout''': one directory per producer batch, `batch=<id>`,
  *    written with mode=overwrite so a checkpoint-replayed micro-batch
  *    rewrites its own partition instead of appending duplicates.
  *    Nested stores add Hive-style partition subdirs below each batch
  *    dir (`batch=N/cell=M`) for partition-pruned reads.
  *  - '''Replay exclusion''' ([[priorBatchPaths]] / [[readPrior]]): the
  *    pre-batch state is read from the EXPLICIT partition paths with
  *    `batch < batchId`, never via a full-store read + filter. The
  *    overwrite of `batch=<batchId>` deletes files a full-store file
  *    index would reference, so replay safety would otherwise hinge on
  *    static partition pruning keeping them out of the scan — an
  *    optimizer behavior, not a contract. Listing the directories
  *    decouples the write target from the read set by construction and
  *    removes the torn-partition edge (crash mid-write of `batch=N`,
  *    then replay reads partial files of N).
  *  - '''Corruption is loud''': a `batch=` directory whose suffix does
  *    not parse as a long raises, rather than being silently included
  *    or skipped.
  *  - '''Compaction''' ([[compact]]): consolidate every batch with
  *    id <= `upToBatch` into a single partition under the LARGEST
  *    EXISTING id <= `upToBatch` (a fresh id would collide with a
  *    future producer batch, whose overwrite would then replace the
  *    consolidated history wholesale). SAFETY CONTRACT: only compact
  *    batch ids the producer's checkpoint has committed past —
  *    foreachBatch replays at most the last uncommitted batch, so
  *    `upToBatch = lastBatchId - 1` is always safe while a stream is
  *    live. Row content is untouched; only physical layout changes.
  *  - '''Crash-safe swap''': the replacement tree is fully written
  *    BESIDE the live one (`<path>__next`), then swapped
  *    (delete + rename). A crash mid-write leaves the live store
  *    untouched; a crash between delete and rename strands the only
  *    copy at `__next`, which [[adoptNext]] heals — every reader calls
  *    it on entry, so the store self-heals on first touch.
  */
private[graft] object BatchStore {

  /** JVM-wide mutex for the swap/adopt TRANSITIONS (never held during
    * tree writes). A serving JVM runs reader threads (whose listBatches
    * self-heal calls [[adoptNext]]) concurrently with the maintenance
    * thread's [[completeSwap]]; unserialized, the reader's heal races
    * the in-flight swap — the worst interleave (reader observes `p`
    * empty, swap renames `__next` into `p`, reader's stale clear then
    * DELETES the freshly-swapped live tree) loses the store. The lock
    * removes every same-JVM interleave; the rename-failure tolerance
    * inside both methods additionally accepts the benign cross-JVM
    * outcome ("someone else completed this exact transition"), and
    * cross-JVM WRITE discipline remains the documented single-writer
    * contract.
    */
  private val swapLock = new Object

  /** FileSystem + Path for a store root. */
  def fsPath(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Self-heal a crashed [[compact]] swap: a crash between the old
    * tree's delete and the rename leaves the ONLY copy at `__next` —
    * adopt it before any read or write touches the store.
    *
    * NON-DESTRUCTIVE by construction: the heal never `delete`s a path
    * that could hold data. The observed-empty live dir is renamed ASIDE
    * (renames move content atomically with the dir), re-verified empty,
    * and only then discarded — so a completeSwap in a DIFFERENT JVM that
    * lands `__next` into the live path between our emptiness check and
    * the clear can no longer be destroyed by the stale clear (the old
    * delete+rename interleave lost both copies: reader sees live empty,
    * cross-JVM swap renames `__next` in, reader's delete removes the
    * freshly-swapped tree). If the re-verify finds the aside tree
    * non-empty we raced exactly that swap: restore it and return — the
    * swap already produced the state we wanted. The JVM-local swapLock
    * still serializes same-JVM transitions; this makes the cross-JVM
    * interleave merely racy, never lossy. A crash mid-heal strands at
    * worst an EMPTY `__aside` dir (harmless; cleared on the next heal).
    */
  def adoptNext(fs: FileSystem, p: Path): Unit = swapLock.synchronized {
    val next = new Path(p.toString + "__next")
    val live = fs.exists(p) && fs.listStatus(p).nonEmpty
    if (!live && fs.exists(next)) {
      if (fs.exists(p)) {
        val aside = new Path(p.toString + "__aside")
        // a stray aside from a crashed heal is empty by construction —
        // verify before clearing it all the same
        if (fs.exists(aside)) {
          require(fs.listStatus(aside).isEmpty,
            s"BatchStore: non-empty $aside — a heal moved data aside and " +
              "crashed before restoring; restore or inspect it manually")
          fs.delete(aside, true)
        }
        if (fs.rename(p, aside)) {
          if (fs.listStatus(aside).nonEmpty) {
            // raced a cross-JVM completeSwap: the tree we moved aside is
            // the freshly-swapped LIVE store — put it back, adoption done
            require(fs.rename(aside, p),
              s"BatchStore: failed to restore raced live tree $aside to $p")
            return
          }
          fs.delete(aside, true) // verified empty — safe to discard
        } else {
          // the move-aside can only lose to ANOTHER HEALER (cross-JVM;
          // swapLock covers same-JVM) having taken the empty tree itself.
          // Two benign shapes, by how far the winner got:
          if (fs.exists(p)) {
            // winner completed the WHOLE heal already (adopted __next
            // into the live path): nothing left to do — but a rename
            // failure with a still-EMPTY live tree present is a real
            // fault (nobody could have raced it) and must surface
            require(fs.listStatus(p).nonEmpty && !fs.exists(next),
              s"BatchStore: failed to move empty $p aside before adopting $next")
            return
          }
          // winner moved the empty tree aside but has not adopted yet:
          // fall through — the adoption below tolerates losing THAT
          // race too (live tree present, __next consumed, is success)
        }
      }
      // a failed adoption must surface, not fall through to an
      // empty-store read that silently forgets the whole history — but a
      // rename that LOST to another party having completed the same
      // adoption (live tree present, __next consumed) is success
      if (!fs.rename(next, p)) {
        require(fs.exists(p) && fs.listStatus(p).nonEmpty && !fs.exists(next),
          s"BatchStore: failed to adopt $next as $p")
      }
    }
  }

  /** The COMMITTED subset of [[listBatches]]: batch dirs carrying the
    * job-commit `_SUCCESS` marker. Serving reads that must be atomic
    * against a concurrent producer pin their snapshot to this set — a
    * batch directory exists (and fills with task files) before its job
    * commits, so an unmarked dir is an in-flight or crashed append that
    * a point-in-time read must not see. Maintenance paths (replay
    * exclusion, compaction) keep using [[listBatches]]: they run under
    * the single-writer contract where no in-flight sibling exists, and
    * must still see a crashed batch's dir to overwrite it.
    */
  def committedBatches(fs: FileSystem, p: Path): Seq[(Long, Path)] =
    listBatches(fs, p).filter { case (_, bp) =>
      fs.exists(new Path(bp, "_SUCCESS"))
    }

  /** A maintenance swap completing mid-read can surface in exactly two
    * shapes: the pinned path is gone at PLAN time (AnalysisException
    * PATH_NOT_FOUND) or a file vanishes at EXECUTION time
    * (FileNotFoundException, usually wrapped in a SparkException whose
    * task-failure message embeds the cause class name rather than the
    * cause object). Everything else — empty-store `require`, genuine
    * query bugs, OOM-adjacent failures — is deterministic and retrying
    * it only burns the full backoff schedule before surfacing an error
    * that could never succeed.
    */
  private[graft] def isVanishedPathFailure(e: Throwable): Boolean = {
    var t = e
    var depth = 0
    while (t != null && depth < 16) {
      t match {
        case _: java.io.FileNotFoundException => return true
        case a: org.apache.spark.sql.AnalysisException
            if a.getMessage != null &&
              (a.getMessage.contains("PATH_NOT_FOUND") ||
                a.getMessage.contains("Path does not exist")) => return true
        case _ =>
      }
      val m = t.getMessage
      if (m != null && (m.contains("FileNotFoundException") ||
          m.contains("PATH_NOT_FOUND") ||
          // Spark 4's execution-time shape when a pinned file vanishes
          // mid-scan ("FAILED_READ_FILE.FILE_NOT_EXIST ... File does not
          // exist. It is possible the underlying files have been updated.")
          m.contains("FILE_NOT_EXIST") ||
          // scoped to PATH/FILE contexts: a bare "does not exist" would
          // also match deterministic analysis failures (missing table,
          // missing column) and burn the whole backoff before surfacing
          m.contains("Path does not exist") ||
          m.contains("File does not exist"))) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
  }

  /** Bounded-retry OPTIMISTIC serving read. A serving query pins a
    * committed-batch snapshot, plans against those explicit paths, and
    * executes; a maintenance swap completing mid-read invalidates the
    * pinned paths and surfaces as a transient failure (missing path at
    * plan time, vanished file at execution time). The snapshot-pin makes
    * torn reads IMPOSSIBLE — a race can only fail loudly, never return a
    * state no quiesced index has — so the correct serving response is to
    * re-pin against the healed tree and re-execute. Only the two failure
    * classes the pin can actually produce ([[isVanishedPathFailure]])
    * are retried; anything else is deterministic and rethrown
    * immediately. Linear backoff; rethrows the last failure once
    * `attempts` is exhausted (a persistent failure is a real outage,
    * not a race).
    */
  def servingRead[T](attempts: Int = 10, backoffMs: Long = 100)(body: => T): T = {
    var i = 0
    while (true) {
      try return body
      catch {
        case scala.util.control.NonFatal(e) if isVanishedPathFailure(e) =>
          i += 1
          if (i >= attempts) throw e
          Thread.sleep(backoffMs * i)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Enumerate the store's `batch=` partitions as (id, path), healing a
    * crashed swap first. A suffix that does not parse is a corrupt store
    * and raises loudly.
    */
  def listBatches(fs: FileSystem, p: Path): Seq[(Long, Path)] = {
    adoptNext(fs, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map { s =>
        val suffix = s.getPath.getName.stripPrefix("batch=")
        val id = scala.util.Try(suffix.toLong).getOrElse(
          throw new IllegalStateException(
            s"BatchStore: corrupt store partition '${s.getPath}' — " +
              "batch= suffix is not a long"))
        (id, s.getPath)
      }
  }

  /** The explicit pre-batch read set: every `batch=` path with
    * id < `batchId` (see the object doc for why explicit paths, not a
    * full-store read + filter).
    */
  def priorBatchPaths(
      spark: SparkSession, path: String, batchId: Long): Seq[String] = {
    val (fs, p) = fsPath(spark, path)
    listBatches(fs, p).filter(_._1 < batchId).map(_._2.toString)
  }

  /** Read the pre-batch store state from the explicit prior paths, or an
    * empty frame of `schema` when no prior batch exists. For nested
    * stores, Hive-style subdirs below each batch dir surface as
    * partition columns (include them in `schema` so the empty frame
    * matches). `basePath` anchors partition parsing at the store root:
    * without it, multiple `batch=N` roots that themselves contain
    * partition subdirs trip CONFLICTING_DIRECTORY_STRUCTURES. The read
    * therefore also carries a `batch` partition column and possibly a
    * different column ORDER than `schema` — callers select by name.
    */
  /** Total DATA bytes at rest in the pre-batch partitions (`batch <
    * batchId`) — the driver-side store-size signal a caller's join-plan
    * gate reads (one FS listing, no Spark job; bookkeeping files
    * excluded). 0 for a missing or empty store.
    */
  def priorBytes(spark: SparkSession, path: String, batchId: Long): Long = {
    val (fs, p) = fsPath(spark, path)
    listBatches(fs, p).filter(_._1 < batchId).map { case (_, bp) =>
      val it = fs.listFiles(bp, true)
      var s = 0L
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) s += f.getLen
      }
      s
    }.sum
  }

  def readPrior(
      spark: SparkSession, path: String, batchId: Long,
      schema: StructType): DataFrame = {
    val prior = priorBatchPaths(spark, path, batchId)
    if (prior.nonEmpty) {
      spark.read.option("basePath", path).parquet(prior: _*)
    } else {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Consolidate every `batch=` partition with id <= `upToBatch` into a
    * single partition of `targetFiles` files under the largest existing
    * id <= `upToBatch`, preserving later partitions verbatim. A store
    * fed hourly for months carries thousands of tiny partitions whose
    * listing and open costs come to dominate every batch's read — the
    * standard small-files decay of any append-only layout.
    *
    * `partitionCols` preserves a nested layout (`batch=N/cell=M` →
    * `partitionCols = Seq("cell")`): the consolidated batch is
    * re-partitioned by the same columns, so partition-pruned reads
    * survive compaction — and the write is preceded by a SHUFFLE on
    * those columns so each partition value lands in exactly ONE task =
    * ONE file. A bare `partitionBy` write leaves up to one file per
    * INPUT task in every subdir (the whole-history read has many), so
    * compaction would rename the small-files problem, not fix it; the
    * shuffle costs one pass over history, paid at maintenance time for
    * an optimal serving layout (parquet files stay splittable, so a
    * large cell in one file still reads in parallel). `merge`
    * post-processes the consolidated rows (e.g. summing additive
    * per-batch statistics rows); later batches are copied verbatim,
    * never merged.
    *
    * See the object doc for the SAFETY CONTRACT and the `__next` swap.
    */
  def compact(
      spark: SparkSession, path: String, upToBatch: Long,
      targetFiles: Int = 8, partitionCols: Seq[String] = Nil,
      merge: DataFrame => DataFrame = identity,
      dataSchema: Option[StructType] = None,
      sortCols: Seq[String] = Nil): Unit =
    compactPrepare(spark, path, upToBatch, targetFiles, partitionCols, merge,
        dataSchema, sortCols)
      .foreach(completeSwap)

  /** A fully-staged replacement tree awaiting its [[completeSwap]]. */
  final case class PendingSwap(fs: FileSystem, live: Path, next: Path)

  /** Phase 1 of [[compact]]: write the consolidated replacement tree
    * BESIDE the live one (`__next`) and return the pending swap, or None
    * when there is nothing to compact. Split from the swap so a
    * MULTI-TREE store ([[Retrieval]]'s postings + stats) can stage every
    * tree first and then swap them back-to-back — the cross-tree window
    * in which a serving read can pin one tree's old snapshot and the
    * other's new one shrinks from a full consolidation write (seconds)
    * to two renames (microseconds); the serving retry absorbs it. Crash
    * before [[completeSwap]] leaves a stale `__next` beside an untouched
    * live tree — harmless; the next prepare clears it.
    */
  def compactPrepare(
      spark: SparkSession, path: String, upToBatch: Long,
      targetFiles: Int = 8, partitionCols: Seq[String] = Nil,
      merge: DataFrame => DataFrame = identity,
      dataSchema: Option[StructType] = None,
      sortCols: Seq[String] = Nil): Option[PendingSwap] = {
    val (fs, p) = fsPath(spark, path)
    val batches = listBatches(fs, p)
    if (!batches.exists(_._1 <= upToBatch)) return None
    val target = batches.map(_._1).filter(_ <= upToBatch).max
    val next = new Path(path + "__next")
    require(fs.delete(next, true) || !fs.exists(next),
      s"BatchStore.compact: failed to clear stale $next")
    // `sortCols` keeps a consolidated file's rows clustered on the
    // caller's data-column key (e.g. the bucketed cells layout stores
    // `cell` INSIDE `cbk=` files): the sort costs nothing extra — the
    // shuffle is already paid — and preserves the tight per-row-group
    // min/max stats the caller's key-isin filters skip on.
    def write(df: DataFrame, out: String): Unit =
      if (partitionCols.nonEmpty) {
        val rep = df.repartition(partitionCols.map(col): _*)
        val clustered =
          if (sortCols.isEmpty) rep
          else rep.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
        clustered.write.partitionBy(partitionCols: _*).parquet(out)
      } else {
        // sortCols clusters the coalesced files too — a flat store's
        // row-group min/max skip key deserves the same treatment as a
        // partitioned one's (and silently ignoring the parameter here
        // would hand a future caller unclustered files with no error)
        val co = df.coalesce(targetFiles)
        val clustered =
          if (sortCols.isEmpty) co else co.sortWithinPartitions(sortCols.map(col): _*)
        clustered.write.parquet(out)
      }
    // `dataSchema` (the store row layout WITHOUT the batch column) lets a
    // tree whose committed partitions can ALL be file-less — a nested
    // store where an empty batch's partitionBy write emits only _SUCCESS,
    // e.g. IncrementalDedup's band index after an all-short seed batch —
    // compact without tripping parquet schema inference on zero footers.
    val rootRead = dataSchema match {
      case Some(s) => spark.read.schema(
        s.add(org.apache.spark.sql.types.StructField(
          "batch", org.apache.spark.sql.types.LongType)))
      case None => spark.read
    }
    write(
      merge(rootRead.parquet(path)
        .filter(col("batch") <= upToBatch).drop("batch")),
      s"$next/batch=$target")
    batches.filter(_._1 > upToBatch).foreach { case (b, bp) =>
      // a torn append can leave a FILE-LESS batch dir above the range
      // (dir created, no task file landed before the crash): there is
      // nothing to consolidate, but the dir itself must survive the swap
      // — it is the stream-replay overwrite target, and callers like
      // compactIndex's pre-flight key divergence detection on its
      // presence. Recreate it empty instead of schema-inferring nothing —
      // and when the source dir carries the job-commit _SUCCESS marker
      // (a legitimately committed zero-row batch, not a torn append),
      // recreate the marker too: dropping it would silently demote the
      // batch out of committedBatches, changing what serving reads and
      // readPriorBands observe.
      val files = fs.listFiles(bp, true)
      var hasData = false
      while (!hasData && files.hasNext) {
        val n = files.next().getPath.getName
        hasData = !n.startsWith("_") && !n.startsWith(".")
      }
      if (hasData) write(spark.read.parquet(s"$path/batch=$b"), s"$next/batch=$b")
      else {
        fs.mkdirs(new Path(s"$next/batch=$b"))
        if (fs.exists(new Path(bp, "_SUCCESS")))
          fs.create(new Path(s"$next/batch=$b/_SUCCESS"), true).close()
      }
    }
    Some(PendingSwap(fs, p, next))
  }

  /** Phase 2 of [[compact]]: the swap. A crash between delete and rename
    * leaves only `__next`, which [[adoptNext]] recovers on the next
    * touch; a FAILED call must surface, not serve a half-swapped store —
    * except the benign race where a reader's heal completed this exact
    * transition (live present, `__next` consumed), which is success.
    */
  def completeSwap(sw: PendingSwap): Unit = swapLock.synchronized {
    require(sw.fs.delete(sw.live, true),
      s"BatchStore.compact: failed to delete old ${sw.live}")
    if (!sw.fs.rename(sw.next, sw.live)) {
      require(sw.fs.exists(sw.live) && sw.fs.listStatus(sw.live).nonEmpty &&
          !sw.fs.exists(sw.next),
        s"BatchStore.compact: failed to swap ${sw.next} into ${sw.live}")
    }
  }
}

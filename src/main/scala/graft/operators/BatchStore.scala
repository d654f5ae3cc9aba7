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

  /** FileSystem + Path for a store root. */
  def fsPath(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Self-heal a crashed [[compact]] swap: a crash between the old
    * tree's delete and the rename leaves the ONLY copy at `__next` —
    * adopt it before any read or write touches the store.
    */
  def adoptNext(fs: FileSystem, p: Path): Unit = {
    val next = new Path(p.toString + "__next")
    val live = fs.exists(p) && fs.listStatus(p).nonEmpty
    if (!live && fs.exists(next)) {
      // a failed adoption must surface, not fall through to an
      // empty-store read that silently forgets the whole history
      require(fs.delete(p, true) || !fs.exists(p),
        s"BatchStore: failed to clear empty $p before adopting $next")
      require(fs.rename(next, p), s"BatchStore: failed to adopt $next as $p")
    }
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
      merge: DataFrame => DataFrame = identity): Unit = {
    val (fs, p) = fsPath(spark, path)
    val batches = listBatches(fs, p)
    if (!batches.exists(_._1 <= upToBatch)) return
    val target = batches.map(_._1).filter(_ <= upToBatch).max
    val next = new Path(path + "__next")
    require(fs.delete(next, true) || !fs.exists(next),
      s"BatchStore.compact: failed to clear stale $next")
    def write(df: DataFrame, out: String): Unit =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*).parquet(out)
      else df.coalesce(targetFiles).write.parquet(out)
    write(
      merge(spark.read.parquet(path)
        .filter(col("batch") <= upToBatch).drop("batch")),
      s"$next/batch=$target")
    batches.map(_._1).filter(_ > upToBatch).foreach { b =>
      write(spark.read.parquet(s"$path/batch=$b"), s"$next/batch=$b")
    }
    // the swap: a crash between these two leaves only __next, which
    // adoptNext recovers on the next touch; a FAILED call must surface,
    // not serve a half-swapped store
    require(fs.delete(p, true), s"BatchStore.compact: failed to delete old $p")
    require(fs.rename(next, p), s"BatchStore.compact: failed to swap $next into $p")
    ()
  }
}

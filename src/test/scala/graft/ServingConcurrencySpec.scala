package graft

import org.apache.spark.sql.functions._

import graft.operators.{BatchStore, IvfIndex, Retrieval}

/** CONCURRENT serving: a reader thread querying a persistent index while
  * a (single) maintenance thread appends and compacts it. The crash
  * specs in RetrievalSpec / IvfIndexSpec kill BETWEEN operations; these
  * interleave DURING them and pin the serving contract: every answer a
  * concurrent reader observes equals the quiesced answer after some
  * prefix of the maintenance ops — never a torn state (one tree's
  * batches scored against another's), never silent staleness past the
  * last op, and transient swap failures are absorbed by
  * [[BatchStore.servingRead]], not surfaced.
  *
  * Mechanism under test (see [[Retrieval.queryIndex]] /
  * [[IvfIndex.probe]]): commit-record append ordering (postings first,
  * stats last), committed-batch snapshot pinning via `_SUCCESS`-gated
  * explicit paths, back-to-back two-tree swaps, and the
  * adopt-vs-swap mutex in [[BatchStore]].
  */
class ServingConcurrencySpec extends SparkSpec {
  import spark.implicits._

  /** Run `op` on a maintenance thread while `read` loops on this thread's
    * behalf; returns (observations, writer failure). Reader failures
    * propagate immediately — a serving read that exhausts its retries is
    * the defect this spec exists to catch.
    */
  private def interleave[A](ops: Seq[() => Unit], read: () => A): Seq[A] = {
    val observed = scala.collection.mutable.ListBuffer.empty[A]
    @volatile var writerFailure: Option[Throwable] = None
    @volatile var done = false
    val writer = new Thread(() => {
      try ops.foreach(op => op())
      catch { case t: Throwable => writerFailure = Some(t) }
      finally done = true
    })
    writer.start()
    while (!done) observed += read()
    writer.join()
    writerFailure.foreach(t => throw t)
    observed += read() // the final, quiesced answer
    observed.toSeq
  }

  test("BM25 queryIndex under concurrent append+compact always answers a quiesced state") {
    val docs = Tables.wide(spark, "/root/testdata/sf0.001", "documents").cache()
    val terms = Seq("vector", "merge", "window")
    def slice(i: Int) = docs.filter($"doc_id" % 4 === i)
    def answer(path: String): Seq[org.apache.spark.sql.Row] =
      BatchStore.servingRead() {
        Retrieval.queryIndex(spark, path, terms, k = 10)
          .orderBy($"rk").collect().toSeq
      }
    // ops 1..5 (op 0 = the build, applied before the reader starts)
    def ops(path: String): Seq[() => Unit] = Seq(
      () => Retrieval.appendIndex(slice(1), $"doc_id", $"text", path, batchId = 1L),
      () => Retrieval.appendIndex(slice(2), $"doc_id", $"text", path, batchId = 2L),
      () => Retrieval.compactIndex(spark, path, upToBatch = 2L),
      () => Retrieval.appendIndex(slice(3), $"doc_id", $"text", path, batchId = 3L),
      () => Retrieval.compactIndex(spark, path, upToBatch = 3L))
    // quiesced reference: the same op sequence, serialized on a shadow
    // index, answer captured after every op — the allowed-answer set
    val shadow = java.nio.file.Files.createTempDirectory("bm25shadow").toString
    Retrieval.buildIndex(slice(0), $"doc_id", $"text", shadow, buckets = 16)
    val allowed = scala.collection.mutable.LinkedHashSet[Seq[org.apache.spark.sql.Row]](
      answer(shadow))
    ops(shadow).foreach { op => op(); allowed += answer(shadow) }
    // appends must actually move the answer or the test can't distinguish
    // staleness from progress (compactions are answer-preserving by
    // contract, so not every op adds a distinct state)
    assert(allowed.size >= 3, s"op sequence produced only ${allowed.size} distinct answers")
    // live: same ops on the maintenance thread, reader looping throughout
    val live = java.nio.file.Files.createTempDirectory("bm25live").toString
    Retrieval.buildIndex(slice(0), $"doc_id", $"text", live, buckets = 16)
    val observed = interleave(ops(live), () => answer(live))
    assert(observed.nonEmpty)
    observed.zipWithIndex.foreach { case (a, i) =>
      assert(allowed.contains(a),
        s"concurrent read $i returned an answer matching NO quiesced index state: " +
          s"${a.take(3)}...")
    }
    // the post-join read sees the final state — no lost updates
    assert(observed.last == answer(shadow))
    docs.unpersist()
  }

  test("IVF probe under concurrent append+compact always answers a quiesced state") {
    val emb = Tables.wide(spark, "/root/testdata/sf0.001", "embeddings").cache()
    val probes = emb.filter($"vec_id" < 3).select($"vec_id", $"embedding").cache()
    probes.count()
    def slice(i: Int) = emb.filter($"vec_id" % 3 === i)
    def answer(path: String): Seq[org.apache.spark.sql.Row] =
      BatchStore.servingRead() {
        IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding",
            k = 5, nprobe = 4)
          .orderBy($"probe_id", $"rk").collect().toSeq
      }
    def ops(path: String): Seq[() => Unit] = Seq(
      () => IvfIndex.append(spark, slice(1), $"vec_id", $"embedding", path, batchId = 1L),
      () => IvfIndex.compact(spark, path, upToBatch = 1L),
      () => IvfIndex.append(spark, slice(2), $"vec_id", $"embedding", path, batchId = 2L),
      () => IvfIndex.compact(spark, path, upToBatch = 2L))
    val shadow = java.nio.file.Files.createTempDirectory("ivfshadow").toString
    IvfIndex.build(slice(0), $"vec_id", $"embedding", shadow, nlist = 8, replicas = 1)
    val allowed = scala.collection.mutable.LinkedHashSet[Seq[org.apache.spark.sql.Row]](
      answer(shadow))
    ops(shadow).foreach { op => op(); allowed += answer(shadow) }
    assert(allowed.size >= 2, s"op sequence produced only ${allowed.size} distinct answers")
    val live = java.nio.file.Files.createTempDirectory("ivflive").toString
    IvfIndex.build(slice(0), $"vec_id", $"embedding", live, nlist = 8, replicas = 1)
    val observed = interleave(ops(live), () => answer(live))
    assert(observed.nonEmpty)
    observed.zipWithIndex.foreach { case (a, i) =>
      assert(allowed.contains(a),
        s"concurrent probe $i returned an answer matching NO quiesced index state")
    }
    assert(observed.last == answer(shadow))
    probes.unpersist(); emb.unpersist()
  }

  test("adopt-on-read heals an in-flight crashed swap under reader concurrency") {
    // crashed-swap state: the ONLY copy of the cells tree is at __next
    // (the window between compact's delete and rename). N readers hit it
    // SIMULTANEOUSLY: exactly one adoption must win, every reader must
    // answer, and the store must end healed — the adopt-vs-adopt rename
    // race (pre-hardening: the loser's require threw, and an interleaved
    // clear could delete the freshly-adopted tree).
    val emb = Tables.wide(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter($"vec_id" < 2).select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfadopt").toString
    IvfIndex.build(emb, $"vec_id", $"embedding", path, nlist = 8, replicas = 1)
    val want = IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding", k = 5)
      .orderBy($"probe_id", $"rk").collect().toSeq
    val (fs, cells) = BatchStore.fsPath(spark, s"$path/cells")
    val next = new org.apache.hadoop.fs.Path(s"$path/cells__next")
    assert(fs.rename(cells, next), "failed to stage the crashed-swap state")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Seq[org.apache.spark.sql.Row]]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (0 until 6).map { _ =>
      new Thread(() => {
        try results.add(BatchStore.servingRead() {
          IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding", k = 5)
            .orderBy($"probe_id", $"rk").collect().toSeq
        })
        catch { case t: Throwable => failures.add(t) }
      })
    }
    readers.foreach(_.start()); readers.foreach(_.join())
    assert(failures.isEmpty, s"reader failed during concurrent adoption: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    results.asScala.foreach(r => assert(r == want))
    assert(fs.exists(cells) && !fs.exists(next), "store did not end healed")
  }

  test("servingRead rethrows deterministic failures immediately, retries only vanished-path classes") {
    // a deterministic failure (empty-store require, a query bug) must not
    // burn the backoff schedule: one attempt, immediate rethrow
    var calls = 0
    val boom = intercept[IllegalArgumentException] {
      BatchStore.servingRead(attempts = 5, backoffMs = 1) {
        calls += 1
        require(false, "no committed batches")
      }
    }
    assert(boom.getMessage.contains("no committed batches"))
    assert(calls == 1, s"deterministic failure was retried $calls times")

    // the two classes a mid-read swap can produce ARE retried to success
    var fnfCalls = 0
    val healed = BatchStore.servingRead(attempts = 5, backoffMs = 1) {
      fnfCalls += 1
      if (fnfCalls < 3) throw new java.io.FileNotFoundException("batch=0/part-0.parquet")
      42
    }
    assert(healed == 42 && fnfCalls == 3)

    // the execution-time shape: SparkException-style wrapper whose MESSAGE
    // embeds the cause class (task failures flatten causes into strings)
    var wrapCalls = 0
    val healed2 = BatchStore.servingRead(attempts = 5, backoffMs = 1) {
      wrapCalls += 1
      if (wrapCalls < 2) throw new RuntimeException(
        "Job aborted due to stage failure: java.io.FileNotFoundException: part-0 does not exist")
      7
    }
    assert(healed2 == 7 && wrapCalls == 2)
  }

  test("compactIndex refuses a postings/stats batch-id divergence loudly") {
    val dir = java.nio.file.Files.createTempDirectory("idxdiverge").toString
    val docs = Seq((1L, "spark shuffles data"), (2L, "duck reads parquet"))
      .toDF("doc_id", "text")
    Retrieval.buildIndex(docs, $"doc_id", $"text", s"$dir/idx", buckets = 4)
    val more = Seq((3L, "spark compacts stores")).toDF("doc_id", "text")
    Retrieval.appendIndex(more, $"doc_id", $"text", s"$dir/idx", batchId = 1L)
    // simulate a crashed writeBatch: postings batch=2 landed, stats did not
    val (fs, p) = BatchStore.fsPath(spark, s"$dir/idx/postings")
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "batch=2"))
    val e = intercept[IllegalArgumentException] {
      Retrieval.compactIndex(spark, s"$dir/idx", upToBatch = 2L)
    }
    assert(e.getMessage.contains("diverge") && e.getMessage.contains("replay"))
    // healing the divergence (replay overwrites batch=2 — here: remove the
    // torn dir) makes the same compaction succeed
    fs.delete(new org.apache.hadoop.fs.Path(p, "batch=2"), true)
    Retrieval.compactIndex(spark, s"$dir/idx", upToBatch = 1L)
    val hits = BatchStore.servingRead() {
      Retrieval.queryIndex(spark, s"$dir/idx", Seq("spark")).collect()
    }
    assert(hits.nonEmpty)
  }

  test("adoptNext heal is non-destructive: a non-empty aside tree aborts instead of being cleared") {
    val dir = java.nio.file.Files.createTempDirectory("adoptaside").toString
    val (fs, p) = BatchStore.fsPath(spark, s"$dir/store")
    val next = new org.apache.hadoop.fs.Path(s"$dir/store__next")
    val aside = new org.apache.hadoop.fs.Path(s"$dir/store__aside")
    // a crashed heal that moved DATA aside (the scenario the old
    // delete-based clear would have destroyed) must abort loudly
    fs.mkdirs(p)
    fs.mkdirs(new org.apache.hadoop.fs.Path(aside, "batch=0"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(next, "batch=1"))
    val e = intercept[IllegalArgumentException] { BatchStore.adoptNext(fs, p) }
    assert(e.getMessage.contains("aside"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(aside, "batch=0")),
      "heal destroyed the aside tree")
    // with the aside healed away, the standard adopt completes: empty live
    // cleared via rename-aside, __next adopted
    fs.delete(aside, true)
    BatchStore.adoptNext(fs, p)
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, "batch=1")))
    assert(!fs.exists(next) && !fs.exists(aside))
  }

  test("adoptNext tolerates losing the move-aside race to a concurrent healer") {
    import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
    // Two reader JVMs can heal the same crashed swap concurrently;
    // swapLock is JVM-local, so the loser's rename(p, aside) fails with
    // p already taken by the winner. Both shapes of how far the winner
    // got must be absorbed — an IllegalArgumentException here is not in
    // servingRead's retry classes, so a spurious throw loses the read.
    def freshStore(tag: String): (FileSystem, Path, Path) = {
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      val (fs, p) = BatchStore.fsPath(spark, s"$dir/store")
      val next = new Path(s"$dir/store__next")
      fs.mkdirs(p) // empty live tree — the crashed-swap shape
      fs.mkdirs(new Path(next, "batch=0"))
      (fs, p, next)
    }
    // shape 1: the winner completed the WHOLE heal between our emptiness
    // check and the move-aside (live tree adopted, __next consumed)
    locally {
      val (fs, p, next) = freshStore("adoptrace1")
      val racing = new FilterFileSystem(fs) {
        override def rename(src: Path, dst: Path): Boolean =
          if (src.toUri.getPath == p.toUri.getPath &&
              dst.toString.endsWith("__aside")) {
            fs.delete(src, true)
            fs.rename(next, p)
            false // the loser's view: rename failed, p gone then re-adopted
          } else super.rename(src, dst)
      }
      BatchStore.adoptNext(racing, p)
      assert(fs.exists(new Path(p, "batch=0")) && !fs.exists(next))
    }
    // shape 2: the winner only moved the empty tree aside — the loser
    // falls through and performs the adoption itself
    locally {
      val (fs, p, next) = freshStore("adoptrace2")
      val racing = new FilterFileSystem(fs) {
        override def rename(src: Path, dst: Path): Boolean =
          if (src.toUri.getPath == p.toUri.getPath &&
              dst.toString.endsWith("__aside")) {
            fs.delete(src, true) // winner took the empty tree, nothing more
            false
          } else super.rename(src, dst)
      }
      BatchStore.adoptNext(racing, p)
      assert(fs.exists(new Path(p, "batch=0")) && !fs.exists(next))
    }
    // a rename failure with the EMPTY live tree still present is a real
    // fault (nobody raced it) and must stay loud
    locally {
      val (fs, p, _) = freshStore("adoptrace3")
      val broken = new FilterFileSystem(fs) {
        override def rename(src: Path, dst: Path): Boolean =
          if (src.toUri.getPath == p.toUri.getPath &&
              dst.toString.endsWith("__aside")) false
          else super.rename(src, dst)
      }
      val e = intercept[IllegalArgumentException] { BatchStore.adoptNext(broken, p) }
      assert(e.getMessage.contains("failed to move"))
    }
  }

  test("compactIndex pre-flight is scoped to upToBatch: a torn batch above the range never freezes maintenance") {
    val dir = java.nio.file.Files.createTempDirectory("idxscope").toString
    val docs = Seq((1L, "spark shuffles data"), (2L, "duck reads parquet"))
      .toDF("doc_id", "text")
    Retrieval.buildIndex(docs, $"doc_id", $"text", s"$dir/idx", buckets = 4)
    val more = Seq((3L, "spark compacts stores")).toDF("doc_id", "text")
    Retrieval.appendIndex(more, $"doc_id", $"text", s"$dir/idx", batchId = 1L)
    // a torn postings batch ABOVE the compaction range (the stream died
    // before its replay): older fully-committed batches must still compact
    val (fs, p) = BatchStore.fsPath(spark, s"$dir/idx/postings")
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "batch=5"))
    Retrieval.compactIndex(spark, s"$dir/idx", upToBatch = 1L)
    val hits = BatchStore.servingRead() {
      Retrieval.queryIndex(spark, s"$dir/idx", Seq("spark")).collect()
    }
    assert(hits.nonEmpty)
    // but compacting THROUGH the torn id still refuses loudly
    val e = intercept[IllegalArgumentException] {
      Retrieval.compactIndex(spark, s"$dir/idx", upToBatch = 5L)
    }
    assert(e.getMessage.contains("diverge"))
  }

  test("compaction preserves the _SUCCESS marker of a committed zero-row batch above the range") {
    // a NESTED store's zero-row batch commits file-less (partitionBy of
    // an empty frame emits only _SUCCESS). Compacting below it recreates
    // the dir — and must recreate the marker too, or the batch silently
    // demotes out of committedBatches after the swap, changing the commit
    // status serving reads and readPriorBands observe.
    val dir = java.nio.file.Files.createTempDirectory("succkeep").toString
    val path = s"$dir/store"
    Seq((1L, 0), (2L, 1)).toDF("v", "cell")
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(s"$path/batch=0")
    spark.range(0).select($"id".as("v"), $"id".cast("int").as("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(s"$path/batch=1")
    val (fs, p) = BatchStore.fsPath(spark, path)
    assert(BatchStore.committedBatches(fs, p).map(_._1).sorted === Seq(0L, 1L))
    BatchStore.compact(spark, path, upToBatch = 0L, partitionCols = Seq("cell"))
    assert(BatchStore.committedBatches(fs, p).map(_._1).sorted === Seq(0L, 1L),
      "compaction demoted the committed zero-row batch above the range")
    // a torn (uncommitted) file-less dir must stay uncommitted — the
    // marker is preserved, never invented
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "batch=2"))
    BatchStore.compact(spark, path, upToBatch = 0L, partitionCols = Seq("cell"))
    assert(BatchStore.listBatches(fs, p).map(_._1).sorted === Seq(0L, 1L, 2L))
    assert(BatchStore.committedBatches(fs, p).map(_._1).sorted === Seq(0L, 1L),
      "compaction invented a _SUCCESS marker for a torn batch dir")
  }

  test("deterministic 'does not exist' analysis failures are not retried as vanished paths") {
    // the retry classifier keys on PATH/FILE contexts — a missing-table
    // or missing-column message (e.g. "[TABLE_OR_VIEW_NOT_FOUND] The
    // table or view `x` cannot be found" / "Table x does not exist")
    // could never heal and must surface after ONE attempt
    var calls = 0
    val boom = intercept[RuntimeException] {
      BatchStore.servingRead(attempts = 5, backoffMs = 1) {
        calls += 1
        throw new RuntimeException("Table or view 'snapshots' does not exist")
      }
    }
    assert(boom.getMessage.contains("does not exist"))
    assert(calls == 1, s"deterministic analysis failure was retried $calls times")
    // while the two genuine path shapes stay retryable
    assert(BatchStore.isVanishedPathFailure(
      new RuntimeException("Path does not exist: file:/store/batch=0")))
    assert(BatchStore.isVanishedPathFailure(
      new RuntimeException("FAILED_READ_FILE.FILE_NOT_EXIST: File does not exist")))
  }
}

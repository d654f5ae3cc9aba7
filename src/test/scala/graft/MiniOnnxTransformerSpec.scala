package graft

import graft.ml.{MiniOnnx, MiniOnnxSentimentClassifier}
import graft.operators.SentimentRunner

/** MiniOnnx transformer op set: a REAL 2-layer, 2-head toy-BERT `.onnx`
  * file (embedding Gather → positional Add → two encoder blocks with
  * multi-head self-attention, GELU-via-Erf FFNs and LayerNormalization →
  * CLS head), written byte-for-byte to the public wire format, parsed
  * and executed by [[MiniOnnx]] — differentially gated against an
  * INDEPENDENT plain-loop forward pass (double precision, its own erf),
  * and driven to labels through the distributed [[SentimentRunner]]
  * path.
  *
  * The two encoder layers deliberately implement the SAME math through
  * DIFFERENT graph shapes: layer 1 splits heads via Reshape + 4-D
  * Transpose and batched rank-4 MatMuls; layer 2 via Split / rank-3
  * MatMuls / Concat — so both formulations every exporter emits are
  * exercised.
  */
object MiniOnnxTransformerSpec extends Serializable {

  import MiniOnnxSpec.Proto

  val V = 16 // vocab
  val H = 8  // hidden
  val Heads = 2
  val Dk = H / Heads
  val S = 6  // sequence length
  val F = 16 // FFN hidden
  val L = 3  // labels

  // ------------------------------------------------- writer extensions

  def nodeA(op: String, ins: Seq[String], outs: Seq[String],
      iAttrs: Map[String, Long] = Map.empty,
      intsAttrs: Map[String, Seq[Long]] = Map.empty)(p: Proto): Unit = {
    ins.foreach(p.str(1, _))
    outs.foreach(p.str(2, _))
    p.str(4, op)
    iAttrs.foreach { case (n, v) =>
      p.msg(5) { a => a.str(1, n); a.int(3, v); () }; ()
    }
    intsAttrs.foreach { case (n, vs) =>
      p.msg(5) { a => a.str(1, n); vs.foreach(a.int(8, _)); () }; ()
    }
  }

  def tensorInt64Raw(name: String, dims: Seq[Int], vals: Array[Long])(p: Proto): Unit = {
    dims.foreach(d => p.int(1, d.toLong))
    p.int(2, 7L)
    val bb = java.nio.ByteBuffer.allocate(8 * vals.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putLong)
    p.bytes(9, bb.array())
    p.str(8, name)
    ()
  }

  /** int64 via the varint int64_data path (field 7) — the second legal
    * encoding, so both parse paths are exercised (the float twins of
    * this pattern live in MiniOnnxSpec).
    */
  def tensorInt64Varint(name: String, dims: Seq[Int], vals: Array[Long])(p: Proto): Unit = {
    dims.foreach(d => p.int(1, d.toLong))
    p.int(2, 7L)
    vals.foreach(p.int(7, _))
    p.str(8, name)
    ()
  }

  // ------------------------------------------------------ weights

  final case class Weights(
    emb: Array[Float], pos: Array[Float],
    wq: Array[Array[Float]], bq: Array[Array[Float]],
    wk: Array[Array[Float]], bk: Array[Array[Float]],
    wv: Array[Array[Float]], bv: Array[Array[Float]],
    wo: Array[Array[Float]], bo: Array[Array[Float]],
    ln1g: Array[Array[Float]], ln1b: Array[Array[Float]],
    w1: Array[Array[Float]], c1: Array[Array[Float]],
    w2: Array[Array[Float]], c2: Array[Array[Float]],
    ln2g: Array[Array[Float]], ln2b: Array[Array[Float]],
    wc: Array[Float], bc: Array[Float])

  def makeWeights(seed: Long): Weights = {
    val rnd = new scala.util.Random(seed)
    def m(n: Int, scale: Float) = Array.fill(n)((rnd.nextFloat() * 2 - 1) * scale)
    def layers(n: Int, scale: Float) = Array.fill(2)(m(n, scale))
    Weights(
      emb = m(V * H, 0.8f), pos = m(S * H, 0.3f),
      wq = layers(H * H, 0.4f), bq = layers(H, 0.1f),
      wk = layers(H * H, 0.4f), bk = layers(H, 0.1f),
      wv = layers(H * H, 0.4f), bv = layers(H, 0.1f),
      wo = layers(H * H, 0.4f), bo = layers(H, 0.1f),
      ln1g = Array.fill(2)(Array.fill(H)(1f + (rnd.nextFloat() - 0.5f) * 0.2f)),
      ln1b = layers(H, 0.1f),
      w1 = layers(H * F, 0.3f), c1 = layers(F, 0.1f),
      w2 = layers(F * H, 0.3f), c2 = layers(H, 0.1f),
      ln2g = Array.fill(2)(Array.fill(H)(1f + (rnd.nextFloat() - 0.5f) * 0.2f)),
      ln2b = layers(H, 0.1f),
      wc = m(H * L, 0.6f), bc = m(L, 0.1f))
  }

  // ------------------------------------------------------ model builder

  def buildToyBertBytes(w: Weights): Array[Byte] = {
    import MiniOnnxSpec.{tensorPackedFloats, tensorRaw}
    val m = new Proto
    m.int(1, 8L)
    m.msg(7) { g =>
      def n(op: String, ins: Seq[String], outs: Seq[String],
          iA: Map[String, Long] = Map.empty,
          intsA: Map[String, Seq[Long]] = Map.empty): Unit = {
        g.msg(1)(nodeA(op, ins, outs, iA, intsA)); ()
      }
      // shared front: float ids → int64 → embedding + positional
      n("Cast", Seq("ids"), Seq("idsI"), iA = Map("to" -> 7L))
      n("Gather", Seq("emb", "idsI"), Seq("x0"))
      n("Add", Seq("x0", "pos"), Seq("h0"))

      def qkv(l: Int, in: String, name: String, wn: String, bn: String): Unit = {
        n("MatMul", Seq(in, s"$wn$l"), Seq(s"$name${l}m"))
        n("Add", Seq(s"$name${l}m", s"$bn$l"), Seq(s"$name$l"))
      }
      def ffnAndNorms(l: Int, attnOut: String, blockIn: String, out: String): Unit = {
        n("Add", Seq(attnOut, s"bo$l"), Seq(s"aO$l"))
        n("Add", Seq(blockIn, s"aO$l"), Seq(s"res1_$l"))
        n("LayerNormalization", Seq(s"res1_$l", s"ln1g$l", s"ln1b$l"), Seq(s"ln1_$l"))
        n("MatMul", Seq(s"ln1_$l", s"w1_$l"), Seq(s"f1m$l"))
        n("Add", Seq(s"f1m$l", s"c1_$l"), Seq(s"f1_$l"))
        // GELU(x) = 0.5 · x · (1 + erf(x / √2))
        n("Div", Seq(s"f1_$l", "sqrt2"), Seq(s"gd$l"))
        n("Erf", Seq(s"gd$l"), Seq(s"ge$l"))
        n("Add", Seq(s"ge$l", "one"), Seq(s"gp$l"))
        n("Mul", Seq(s"f1_$l", s"gp$l"), Seq(s"gm$l"))
        n("Mul", Seq(s"gm$l", "half"), Seq(s"g$l"))
        n("MatMul", Seq(s"g$l", s"w2_$l"), Seq(s"f2m$l"))
        n("Add", Seq(s"f2m$l", s"c2_$l"), Seq(s"f2_$l"))
        n("Add", Seq(s"ln1_$l", s"f2_$l"), Seq(s"res2_$l"))
        n("LayerNormalization", Seq(s"res2_$l", s"ln2g$l", s"ln2b$l"), Seq(out))
      }

      // ---- layer 0: Reshape + 4-D Transpose head split, rank-4 MatMuls
      qkv(0, "h0", "q", "wq", "bq"); qkv(0, "h0", "k", "wk", "bk")
      qkv(0, "h0", "v", "wv", "bv")
      for (t <- Seq("q", "k", "v")) {
        n("Reshape", Seq(s"${t}0", "shapeHeads"), Seq(s"${t}0r"))
        n("Transpose", Seq(s"${t}0r"), Seq(s"${t}0h"),
          intsA = Map("perm" -> Seq(0L, 2L, 1L, 3L)))
      }
      n("Transpose", Seq("k0h"), Seq("k0t"), intsA = Map("perm" -> Seq(0L, 1L, 3L, 2L)))
      n("MatMul", Seq("q0h", "k0t"), Seq("sc0"))
      n("Mul", Seq("sc0", "invsq"), Seq("scs0"))
      n("Softmax", Seq("scs0"), Seq("pr0"), iA = Map("axis" -> -1L))
      n("MatMul", Seq("pr0", "v0h"), Seq("cx0"))
      n("Transpose", Seq("cx0"), Seq("cx0t"), intsA = Map("perm" -> Seq(0L, 2L, 1L, 3L)))
      n("Reshape", Seq("cx0t", "shapeMerge"), Seq("cm0"))
      n("MatMul", Seq("cm0", "wo0"), Seq("om0"))
      ffnAndNorms(0, "om0", "h0", "h1")

      // ---- layer 1: Split / rank-3 per-head MatMuls / Concat
      qkv(1, "h1", "q", "wq", "bq"); qkv(1, "h1", "k", "wk", "bk")
      qkv(1, "h1", "v", "wv", "bv")
      for (t <- Seq("q", "k", "v"))
        n("Split", Seq(s"${t}1"), Seq(s"${t}1a", s"${t}1b"),
          iA = Map("axis" -> 2L), intsA = Map("split" -> Seq(Dk.toLong, Dk.toLong)))
      for (hd <- Seq("a", "b")) {
        n("Transpose", Seq(s"k1$hd"), Seq(s"k1${hd}t"),
          intsA = Map("perm" -> Seq(0L, 2L, 1L)))
        n("MatMul", Seq(s"q1$hd", s"k1${hd}t"), Seq(s"sc1$hd"))
        n("Mul", Seq(s"sc1$hd", "invsq"), Seq(s"scs1$hd"))
        n("Softmax", Seq(s"scs1$hd"), Seq(s"pr1$hd"))
        n("MatMul", Seq(s"pr1$hd", s"v1$hd"), Seq(s"cx1$hd"))
      }
      n("Concat", Seq("cx1a", "cx1b"), Seq("cm1"), iA = Map("axis" -> 2L))
      n("MatMul", Seq("cm1", "wo1"), Seq("om1"))
      ffnAndNorms(1, "om1", "h1", "enc")

      // ---- CLS head
      n("Split", Seq("enc"), Seq("clsTok", "restTok"),
        iA = Map("axis" -> 1L), intsA = Map("split" -> Seq(1L, (S - 1).toLong)))
      n("Reshape", Seq("clsTok", "shapeCls"), Seq("cls"))
      n("Gemm", Seq("cls", "wc", "bc"), Seq("logits"))

      g.str(2, "toy-bert")
      // initializers — mixed encodings on purpose
      g.msg(5)(tensorRaw("emb", Seq(V, H), w.emb))
      g.msg(5)(tensorPackedFloats("pos", Seq(S, H), w.pos))
      for (l <- 0 to 1) {
        g.msg(5)(tensorRaw(s"wq$l", Seq(H, H), w.wq(l)))
        g.msg(5)(tensorRaw(s"bq$l", Seq(H), w.bq(l)))
        g.msg(5)(tensorRaw(s"wk$l", Seq(H, H), w.wk(l)))
        g.msg(5)(tensorRaw(s"bk$l", Seq(H), w.bk(l)))
        g.msg(5)(tensorRaw(s"wv$l", Seq(H, H), w.wv(l)))
        g.msg(5)(tensorRaw(s"bv$l", Seq(H), w.bv(l)))
        g.msg(5)(tensorRaw(s"wo$l", Seq(H, H), w.wo(l)))
        g.msg(5)(tensorRaw(s"bo$l", Seq(H), w.bo(l)))
        g.msg(5)(tensorRaw(s"ln1g$l", Seq(H), w.ln1g(l)))
        g.msg(5)(tensorRaw(s"ln1b$l", Seq(H), w.ln1b(l)))
        g.msg(5)(tensorRaw(s"w1_$l", Seq(H, F), w.w1(l)))
        g.msg(5)(tensorRaw(s"c1_$l", Seq(F), w.c1(l)))
        g.msg(5)(tensorRaw(s"w2_$l", Seq(F, H), w.w2(l)))
        g.msg(5)(tensorRaw(s"c2_$l", Seq(H), w.c2(l)))
        g.msg(5)(tensorRaw(s"ln2g$l", Seq(H), w.ln2g(l)))
        g.msg(5)(tensorRaw(s"ln2b$l", Seq(H), w.ln2b(l)))
      }
      g.msg(5)(tensorRaw("wc", Seq(H, L), w.wc))
      g.msg(5)(tensorRaw("bc", Seq(L), w.bc))
      g.msg(5)(tensorPackedFloats("invsq", Seq(1),
        Array((1.0 / math.sqrt(Dk)).toFloat)))
      g.msg(5)(tensorPackedFloats("sqrt2", Seq(1), Array(math.sqrt(2.0).toFloat)))
      g.msg(5)(tensorPackedFloats("one", Seq(1), Array(1f)))
      g.msg(5)(tensorPackedFloats("half", Seq(1), Array(0.5f)))
      g.msg(5)(tensorInt64Raw("shapeHeads", Seq(4),
        Array(0L, 0L, Heads.toLong, Dk.toLong)))
      g.msg(5)(tensorInt64Varint("shapeMerge", Seq(3), Array(0L, 0L, H.toLong)))
      g.msg(5)(tensorInt64Raw("shapeCls", Seq(2), Array(-1L, H.toLong)))
      g.msg(11)(_.str(1, "ids"))
      g.msg(12)(_.str(1, "logits"))
      ()
    }
    m.msg(8)(_.int(2, 17L))
    m.toBytes
  }

  // ------------------------------- independent reference forward pass

  /** erf by Maclaurin series in double (NOT the rational approximation
    * MiniOnnx uses) — an independent implementation for the
    * differential gate. |x| > 4 saturates (|1 − erf(4)| < 2e-8).
    */
  def refErf(x: Double): Double = {
    if (x > 4) return 1.0
    if (x < -4) return -1.0
    var term = x
    var sum = x
    var n = 1
    while (math.abs(term) > 1e-17 && n < 200) {
      term = -term * x * x * (2 * n - 1) / (n * (2 * n + 1.0))
      sum += term
      n += 1
    }
    sum * 2.0 / math.sqrt(math.Pi)
  }

  /** The toy-BERT forward pass in plain loops and doubles. */
  def refLogits(w: Weights, ids: Array[Int]): Array[Double] = {
    require(ids.length == S)
    var h = Array.tabulate(S, H)((s, j) => w.emb(ids(s) * H + j).toDouble +
      w.pos(s * H + j))
    def proj(x: Array[Array[Double]], m: Array[Float], b: Array[Float],
        cols: Int): Array[Array[Double]] =
      x.map { row =>
        Array.tabulate(cols)(j =>
          row.indices.map(t => row(t) * m(t * cols + j)).sum + b(j))
      }
    def layerNorm(x: Array[Array[Double]], gA: Array[Float], bA: Array[Float]) =
      x.map { row =>
        val mean = row.sum / row.length
        val v = row.map(d => (d - mean) * (d - mean)).sum / row.length
        val inv = 1.0 / math.sqrt(v + 1e-5)
        Array.tabulate(row.length)(j => (row(j) - mean) * inv * gA(j) + bA(j))
      }
    for (l <- 0 to 1) {
      val q = proj(h, w.wq(l), w.bq(l), H)
      val k = proj(h, w.wk(l), w.bk(l), H)
      val v = proj(h, w.wv(l), w.bv(l), H)
      val ctx = Array.ofDim[Double](S, H)
      for (hd <- 0 until Heads) {
        val off = hd * Dk
        for (i <- 0 until S) {
          val scores = Array.tabulate(S) { j =>
            (0 until Dk).map(t => q(i)(off + t) * k(j)(off + t)).sum /
              math.sqrt(Dk)
          }
          val mx = scores.max
          val exps = scores.map(sc => math.exp(sc - mx))
          val z = exps.sum
          for (t <- 0 until Dk; j <- 0 until S)
            ctx(i)(off + t) += exps(j) / z * v(j)(off + t)
        }
      }
      val attnOut = proj(ctx, w.wo(l), w.bo(l), H)
      val res1 = Array.tabulate(S, H)((s, j) => h(s)(j) + attnOut(s)(j))
      val ln1 = layerNorm(res1, w.ln1g(l), w.ln1b(l))
      val f1 = proj(ln1, w.w1(l), w.c1(l), F)
      val gelu = f1.map(_.map(x => 0.5 * x * (1 + refErf(x / math.sqrt(2.0)))))
      val f2 = proj(gelu, w.w2(l), w.c2(l), H)
      val res2 = Array.tabulate(S, H)((s, j) => ln1(s)(j) + f2(s)(j))
      h = layerNorm(res2, w.ln2g(l), w.ln2b(l))
    }
    Array.tabulate(L)(j =>
      (0 until H).map(t => h(0)(t) * w.wc(t * L + j)).sum + w.bc(j))
  }

  // ------------------------------------------------------ tokenizer

  /** Deterministic toy tokenizer: whitespace tokens hashed into the
    * vocab's non-pad range, padded/truncated to S, emitted as floats
    * (the model Casts back to int64 — the float-carried-ids path).
    */
  def tokenize(text: String): Array[Float] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .map(t => (math.abs(t.hashCode) % (V - 2)) + 2)
    toks.take(S).padTo(S, 0).map(_.toFloat)
  }
}

class MiniOnnxTransformerSpec extends SparkSpec {

  import MiniOnnxTransformerSpec._

  private val weights = makeWeights(seed = 99L)
  private val modelBytes = buildToyBertBytes(weights)

  private def writeModel(): String = {
    val f = java.nio.file.Files.createTempFile("toybert", ".onnx")
    java.nio.file.Files.write(f, modelBytes)
    f.toString
  }

  test("parses the transformer graph: ops, int64 initializers, attrs") {
    val m = MiniOnnx.parse(modelBytes)
    val ops = m.graph.nodes.map(_.opType).toSet
    assert(Set("Cast", "Gather", "LayerNormalization", "Erf", "Transpose",
      "Reshape", "Split", "Concat", "Softmax", "MatMul", "Gemm")
      .subsetOf(ops))
    assert(m.graph.initializers("shapeHeads").i64.toSeq == Seq(0L, 0L, 2L, 4L))
    assert(m.graph.initializers("shapeMerge").i64.toSeq == Seq(0L, 0L, 8L))
    assert(m.graph.initializers("shapeCls").i64.toSeq == Seq(-1L, 8L))
    val perm = m.graph.nodes.find(n => n.opType == "Transpose" &&
      n.inputs == Seq("q0r")).get.attrs("perm").ints
    assert(perm == Seq(0L, 2L, 1L, 3L))
  }

  test("2-layer attention forward pass matches an independent reference") {
    val m = MiniOnnx.parse(modelBytes)
    val batch = Array(
      Array(2, 5, 9, 13, 0, 0),
      Array(3, 3, 3, 3, 3, 3),
      Array(15, 2, 7, 11, 4, 8),
      Array(0, 0, 0, 0, 0, 0))
    val x = MiniOnnx.Tensor(Seq(batch.length, S),
      batch.flatten.map(_.toFloat))
    val y = MiniOnnx.run(m, Map("ids" -> x))("logits")
    assert(y.dims == Seq(batch.length, L))
    for (i <- batch.indices) {
      val ref = refLogits(weights, batch(i))
      for (j <- 0 until L) {
        val got = y.data(i * L + j)
        assert(math.abs(got - ref(j)) < 2e-3,
          s"row $i logit $j: $got vs ref ${ref(j)}")
      }
    }
  }

  test("batch size independence: one row alone equals the batched row") {
    val m = MiniOnnx.parse(modelBytes)
    val a = Array(4, 9, 2, 0, 0, 0)
    val b = Array(7, 7, 1, 12, 3, 5)
    def run1(ids: Array[Int]) = MiniOnnx.run(m,
      Map("ids" -> MiniOnnx.Tensor(Seq(1, S), ids.map(_.toFloat))))("logits").data
    val both = MiniOnnx.run(m, Map("ids" ->
      MiniOnnx.Tensor(Seq(2, S), (a ++ b).map(_.toFloat))))("logits").data
    assert(run1(a).zip(both.take(L)).forall { case (x, y) => math.abs(x - y) < 1e-5 })
    assert(run1(b).zip(both.drop(L)).forall { case (x, y) => math.abs(x - y) < 1e-5 })
  }

  test("distributed SentimentRunner path: attention model to golden labels") {
    import spark.implicits._
    val path = writeModel()
    // texts chosen so the reference assigns all three labels (a search
    // over toy-vocab phrases; asserted below so weight drift can't make
    // this gate vacuous)
    val texts = Seq(
      "antri rapi",
      "bagus rapi antri",
      "siang bagus rapi makan netral siang",
      "makan siang di sekolah baru",
      null: String)
    // goldens from the INDEPENDENT reference, not from MiniOnnx
    val labels = Seq("positive", "neutral", "negative")
    val expected = texts.map {
      case null => "NEUTRAL"
      case t =>
        val ref = refLogits(weights, tokenize(t).map(_.toInt))
        labels(ref.indexOf(ref.max))
    }
    assert(expected.toSet == Set("positive", "neutral", "negative", "NEUTRAL"),
      s"golden set degenerated: $expected")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(3)
    val got = SentimentRunner.label(
        docs, "text", MiniOnnxSentimentClassifier(path, tokenize), batchSize = 2)
      .select($"id", $"sentiment_label")
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == expected, s"got $got expected $expected")
  }
}

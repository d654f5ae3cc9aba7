package graft.ml

/** Minimal ONNX runtime in pure Scala — enough of the PUBLIC ONNX spec
  * (onnx.proto3 protobuf schema + operator definitions, onnx.ai) to load
  * a real `.onnx` file and execute small feed-forward float32 graphs:
  * Gemm / MatMul / Add / Relu / Sigmoid / Tanh / Softmax / Identity.
  *
  * Why it exists: the library's production sentiment path
  * ([[graft.operators.OnnxSentimentClassifier]]) binds ONNX Runtime
  * reflectively, but this build environment cannot resolve those jars —
  * which left the model seam tested only against stubbed logits. This
  * runtime closes that gap from the other side: a REAL ONNX protobuf
  * model (written byte-for-byte to the public wire format) is parsed and
  * executed with real matrix arithmetic, so batching, scoring, softmax,
  * and label mapping are exercised against an actual model file, not a
  * canned logits function. It is NOT a replacement for ONNX Runtime at
  * scale (no broadcasting beyond bias rows, no training ops, float32
  * rank-2 only) and throws loudly outside its envelope.
  *
  * Protobuf wire format (public spec): messages are (tag, payload)
  * sequences; tag = field_number << 3 | wire_type; wire types used by
  * ONNX: 0 = varint, 2 = length-delimited, 5 = 32-bit. Unknown fields
  * are skipped by spec, which keeps this reader robust to ONNX versions
  * adding fields.
  */
object MiniOnnx {

  /** Row-major float32 tensor. */
  final case class Tensor(dims: Seq[Int], data: Array[Float]) {
    require(dims.product == data.length,
      s"tensor dims ${dims.mkString("x")} != ${data.length} values")
    def rows: Int = if (dims.length == 2) dims.head else 1
    def cols: Int = dims.last
  }

  final case class Attr(name: String, i: Option[Long], f: Option[Float])
  final case class Node(opType: String, inputs: Seq[String],
    outputs: Seq[String], attrs: Map[String, Attr])
  final case class Graph(nodes: Seq[Node], initializers: Map[String, Tensor],
    inputNames: Seq[String], outputNames: Seq[String])
  final case class Model(irVersion: Long, opsetVersion: Long, graph: Graph)

  // ------------------------------------------------------ wire reading

  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      var more = true
      while (more) {
        require(pos < end, "truncated varint")
        val b = buf(pos)
        pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
        require(shift <= 70, "varint too long")
      }
      out
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def bytes(): (Int, Int) = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= end, s"truncated bytes field ($len)")
      val start = pos
      pos += len
      (start, start + len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => bytes(); ()
      case 5 => fixed32(); ()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def sub(r: Reader): Reader = {
    val (s, e) = r.bytes()
    new Reader(r.buf, s, e)
  }

  private def str(r: Reader): String = {
    val (s, e) = r.bytes()
    new String(r.buf, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** One pass over a message: dispatch on field number, skip unknowns. */
  private def fields(r: Reader)(f: (Int, Int, Reader) => Unit): Unit =
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      f(field, wire, r)
    }

  // ------------------------------------------------------ ONNX messages

  private def parseTensor(r: Reader): (String, Tensor) = {
    val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
    var dataType = 1L
    var name = ""
    var floats = scala.collection.mutable.ArrayBuffer.empty[Float]
    var raw: Array[Byte] = null
    fields(r) {
      case (1, 0, rr) => dims += rr.varint().toInt
      case (1, 2, rr) => // packed dims
        val p = sub(rr); while (p.hasMore) dims += p.varint().toInt
      case (2, 0, rr) => dataType = rr.varint()
      case (4, 5, rr) => floats += java.lang.Float.intBitsToFloat(rr.fixed32())
      case (4, 2, rr) => // packed float_data
        val p = sub(rr); while (p.hasMore) floats += java.lang.Float.intBitsToFloat(p.fixed32())
      case (8, 2, rr) => name = str(rr)
      case (9, 2, rr) =>
        val (s, e) = rr.bytes()
        raw = java.util.Arrays.copyOfRange(rr.buf, s, e)
      case (_, w, rr) => rr.skip(w)
    }
    require(dataType == 1L, s"tensor '$name': only float32 supported, got type $dataType")
    val data =
      if (raw != null) {
        require(raw.length % 4 == 0, s"tensor '$name': raw_data not float32-aligned")
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.fill(raw.length / 4)(bb.getFloat())
      } else floats.toArray
    (name, Tensor(dims.toSeq, data))
  }

  private def parseAttr(r: Reader): Attr = {
    var name = ""
    var i: Option[Long] = None
    var f: Option[Float] = None
    fields(r) {
      case (1, 2, rr) => name = str(rr)
      case (2, 5, rr) => f = Some(java.lang.Float.intBitsToFloat(rr.fixed32()))
      case (3, 0, rr) => i = Some(rr.varint())
      case (_, w, rr) => rr.skip(w)
    }
    Attr(name, i, f)
  }

  private def parseNode(r: Reader): Node = {
    val ins = scala.collection.mutable.ArrayBuffer.empty[String]
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    var op = ""
    val attrs = scala.collection.mutable.Map.empty[String, Attr]
    fields(r) {
      case (1, 2, rr) => ins += str(rr)
      case (2, 2, rr) => outs += str(rr)
      case (4, 2, rr) => op = str(rr)
      case (5, 2, rr) =>
        val a = parseAttr(sub(rr)); attrs(a.name) = a
      case (_, w, rr) => rr.skip(w)
    }
    Node(op, ins.toSeq, outs.toSeq, attrs.toMap)
  }

  /** ValueInfoProto: only the name matters here. */
  private def parseValueInfoName(r: Reader): String = {
    var name = ""
    fields(r) {
      case (1, 2, rr) => name = str(rr)
      case (_, w, rr) => rr.skip(w)
    }
    name
  }

  private def parseGraph(r: Reader): Graph = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    val inits = scala.collection.mutable.Map.empty[String, Tensor]
    val ins = scala.collection.mutable.ArrayBuffer.empty[String]
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    fields(r) {
      case (1, 2, rr) => nodes += parseNode(sub(rr))
      case (5, 2, rr) =>
        val (n, t) = parseTensor(sub(rr)); inits(n) = t
      case (11, 2, rr) => ins += parseValueInfoName(sub(rr))
      case (12, 2, rr) => outs += parseValueInfoName(sub(rr))
      case (_, w, rr) => rr.skip(w)
    }
    Graph(nodes.toSeq, inits.toMap, ins.toSeq, outs.toSeq)
  }

  def parse(modelBytes: Array[Byte]): Model = {
    val r = new Reader(modelBytes, 0, modelBytes.length)
    var ir = 0L
    var opset = 0L
    var graph: Option[Graph] = None
    fields(r) {
      case (1, 0, rr) => ir = rr.varint()
      case (7, 2, rr) => graph = Some(parseGraph(sub(rr)))
      case (8, 2, rr) =>
        // opset_import: domain (1), version (2)
        var v = 0L
        fields(sub(rr)) {
          case (2, 0, p) => v = p.varint()
          case (_, w, p) => p.skip(w)
        }
        opset = v
      case (_, w, rr) => rr.skip(w)
    }
    Model(ir, opset,
      graph.getOrElse(throw new IllegalArgumentException("model has no graph")))
  }

  def load(path: String): Model =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // ------------------------------------------------------ execution

  private def matmul(a: Tensor, b: Tensor): Tensor = {
    require(a.dims.length == 2 && b.dims.length == 2 && a.cols == b.rows,
      s"matmul shape mismatch ${a.dims.mkString("x")} · ${b.dims.mkString("x")}")
    val (n, k, m) = (a.rows, a.cols, b.cols)
    val out = new Array[Float](n * m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        var acc = 0.0f
        var t = 0
        while (t < k) { acc += a.data(i * k + t) * b.data(t * m + j); t += 1 }
        out(i * m + j) = acc
        j += 1
      }
      i += 1
    }
    Tensor(Seq(n, m), out)
  }

  private def transpose(t: Tensor): Tensor = {
    require(t.dims.length == 2, "transpose needs rank 2")
    val (n, m) = (t.rows, t.cols)
    val out = new Array[Float](n * m)
    for (i <- 0 until n; j <- 0 until m) out(j * n + i) = t.data(i * m + j)
    Tensor(Seq(m, n), out)
  }

  /** Add with the one broadcast shape a feed-forward net needs:
    * [N,M] + [M] (or [1,M]) row bias; plus exact same-shape add.
    */
  private def add(a: Tensor, b: Tensor): Tensor =
    if (a.dims == b.dims)
      Tensor(a.dims, a.data.zip(b.data).map { case (x, y) => x + y })
    else {
      val bias =
        if (b.dims.length == 1 || (b.dims.length == 2 && b.rows == 1)) b
        else throw new IllegalArgumentException(
          s"add broadcast unsupported: ${a.dims.mkString("x")} + ${b.dims.mkString("x")}")
      require(a.cols == bias.cols,
        s"bias width ${bias.cols} != ${a.cols}")
      val out = new Array[Float](a.data.length)
      var i = 0
      while (i < a.data.length) {
        out(i) = a.data(i) + bias.data(i % a.cols)
        i += 1
      }
      Tensor(a.dims, out)
    }

  private def unary(t: Tensor, f: Float => Float): Tensor =
    Tensor(t.dims, t.data.map(f))

  private def softmaxRows(t: Tensor): Tensor = {
    require(t.dims.length <= 2, "softmax needs rank <= 2")
    val m = t.cols
    val out = new Array[Float](t.data.length)
    var r0 = 0
    while (r0 < t.data.length) {
      var mx = Float.NegativeInfinity
      var j = 0
      while (j < m) { if (t.data(r0 + j) > mx) mx = t.data(r0 + j); j += 1 }
      var sum = 0.0
      j = 0
      while (j < m) { sum += math.exp((t.data(r0 + j) - mx).toDouble); j += 1 }
      j = 0
      while (j < m) {
        out(r0 + j) = (math.exp((t.data(r0 + j) - mx).toDouble) / sum).toFloat
        j += 1
      }
      r0 += m
    }
    Tensor(t.dims, out)
  }

  /** Execute the graph on `inputs`; returns the graph outputs by name.
    * ONNX requires nodes in topological order (spec: "nodes ... sorted in
    * topological order"), so execution is one sequential pass.
    */
  def run(model: Model, inputs: Map[String, Tensor]): Map[String, Tensor] = {
    val g = model.graph
    val missing = g.inputNames.filterNot(n =>
      inputs.contains(n) || g.initializers.contains(n))
    require(missing.isEmpty, s"missing graph inputs: ${missing.mkString(", ")}")
    val values = scala.collection.mutable.Map.empty[String, Tensor]
    values ++= g.initializers
    values ++= inputs
    def in(node: Node, i: Int): Tensor =
      values.getOrElse(node.inputs(i), throw new IllegalStateException(
        s"${node.opType}: undefined input '${node.inputs(i)}' — graph not topological?"))
    g.nodes.foreach { node =>
      val out: Tensor = node.opType match {
        case "MatMul" => matmul(in(node, 0), in(node, 1))
        case "Gemm" =>
          val alpha = node.attrs.get("alpha").flatMap(_.f).getOrElse(1.0f)
          val beta = node.attrs.get("beta").flatMap(_.f).getOrElse(1.0f)
          val tA = node.attrs.get("transA").flatMap(_.i).getOrElse(0L) != 0L
          val tB = node.attrs.get("transB").flatMap(_.i).getOrElse(0L) != 0L
          val a = if (tA) transpose(in(node, 0)) else in(node, 0)
          val b = if (tB) transpose(in(node, 1)) else in(node, 1)
          val ab = matmul(a, b)
          val scaled = if (alpha == 1.0f) ab else unary(ab, _ * alpha)
          if (node.inputs.size > 2) {
            val c = in(node, 2)
            add(scaled, if (beta == 1.0f) c else unary(c, _ * beta))
          } else scaled
        case "Add" => add(in(node, 0), in(node, 1))
        case "Relu" => unary(in(node, 0), v => if (v > 0) v else 0f)
        case "Sigmoid" => unary(in(node, 0), v => (1.0 / (1.0 + math.exp(-v.toDouble))).toFloat)
        case "Tanh" => unary(in(node, 0), v => math.tanh(v.toDouble).toFloat)
        case "Softmax" => softmaxRows(in(node, 0))
        case "Identity" => in(node, 0)
        case op => throw new UnsupportedOperationException(
          s"MiniOnnx does not implement op '$op' (supported: Gemm, MatMul, " +
            "Add, Relu, Sigmoid, Tanh, Softmax, Identity)")
      }
      values(node.outputs.head) = out
    }
    g.outputNames.map(n => n -> values.getOrElse(n,
      throw new IllegalStateException(s"graph output '$n' never produced"))).toMap
  }
}

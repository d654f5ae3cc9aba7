package graft.ml

import graft.operators.SentimentClassifier

/** [[SentimentClassifier]] executing a REAL `.onnx` model file through
  * [[MiniOnnx]] — the jar-free counterpart of
  * [[graft.operators.OnnxSentimentClassifier]]. The scoring core is the
  * SAME `OnnxSentimentClassifier.scoreBatch` (null/empty fallback rows,
  * the reference's 512-char pre-truncation, batch-size checks, softmax,
  * label mapping); only the logits provider differs: text is featurized
  * to a fixed-width float vector (the model's declared input) and run
  * through the parsed ONNX graph as one [N, dim] batch.
  *
  * Intended envelope: small float32 classifiers within the MiniOnnx op
  * set — since round 9 that includes transformer ENCODERS (embedding
  * Gather, multi-head attention, GELU-via-Erf, LayerNormalization):
  * MiniOnnxTransformerSpec drives a real 2-layer toy-BERT `.onnx`
  * through this exact class to reference-derived golden labels. A
  * `featurize` that emits token ids as floats plus a leading `Cast`
  * node in the graph is the id-input convention. Production-size
  * checkpoints still want the real ONNX Runtime path for throughput
  * (vectorized kernels); this class exists so a deployment WITHOUT the
  * optional jars can still execute an exported sentiment head
  * end-to-end, and so the model seam is integration-tested against
  * real model bytes instead of stubbed logits.
  *
  * The model is loaded lazily per executor (the case class serializes as
  * the path + featurizer), mirroring OnnxSentimentClassifier's
  * transient-lazy runtime.
  */
final case class MiniOnnxSentimentClassifier(
    modelPath: String,
    featurize: String => Array[Float],
    labels: Seq[String] = Seq("positive", "neutral", "negative"))
    extends SentimentClassifier {

  @transient private lazy val model: MiniOnnx.Model = MiniOnnx.load(modelPath)

  @transient private lazy val inputName: String = {
    val fromGraph = model.graph.inputNames.filterNot(model.graph.initializers.contains)
    require(fromGraph.size == 1,
      s"expected exactly one non-initializer graph input, got $fromGraph")
    fromGraph.head
  }

  private def batchLogits(texts: Seq[String]): Seq[Array[Float]] = {
    val feats = texts.map(featurize)
    val dim = feats.head.length
    require(feats.forall(_.length == dim), "featurizer emitted ragged rows")
    val x = MiniOnnx.Tensor(Seq(feats.size, dim), feats.flatten.toArray)
    val outName = model.graph.outputNames.head
    val y = MiniOnnx.run(model, Map(inputName -> x))(outName)
    require(y.rows == feats.size,
      s"model returned ${y.rows} rows for ${feats.size} inputs")
    (0 until y.rows).map(i =>
      java.util.Arrays.copyOfRange(y.data, i * y.cols, (i + 1) * y.cols))
  }

  override def classifyBatch(texts: Seq[String]): Seq[(String, Double)] =
    graft.operators.OnnxSentimentClassifier.scoreBatch(texts, labels, batchLogits)
}

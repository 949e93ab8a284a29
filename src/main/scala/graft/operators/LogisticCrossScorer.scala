package graft.operators

import java.io.{DataInputStream, EOFException, InputStream}

/** A real serialized cross-scorer for the [[BatchedScorer]] seam — the
  * second model seam's counterpart of [[LinearTextModel]] (reference
  * query.py:57-60 `CrossEncoder.predict`): a distilled logistic scorer
  * over (query, document) interaction features, whose weights load
  * from a binary GLSC artifact. Tiny but REAL: the logit is
  * `w0 + Σ w_i·f_i(query, text)` with the weight vector read from
  * bytes on disk — a cross-encoder distilled to a feature-based
  * student (a standard serving trick when the teacher is too slow for
  * the rerank budget) has exactly this shape, and a full ONNX/JNI
  * cross-encoder slots into the same `(query, batch) => logits` fn.
  *
  * Features (computed from the texts alone — the retrieval features in
  * [[BatchedScorer.Pair]] are ignored, like a real cross-encoder):
  * f1 = |q∩d| token overlap, f2 = Jaccard(q, d), f3 = log1p(doc
  * tokens), f4 = query-coverage |q∩d|/|q|.
  *
  * Artifact format (`GLSC`): magic "GLSC", version i32 = 1, n i32 =
  * NumFeatures+1, then n little-endian float32 (bias first).
  */
final class LogisticCrossScorer(val weights: Array[Float]) extends Serializable {
  require(weights.length == LogisticCrossScorer.NumFeatures + 1,
    s"GLSC weight vector must be ${LogisticCrossScorer.NumFeatures + 1} floats")

  private def toks(s: String): Array[String] =
    s.toLowerCase.trim.split("\\W+").filter(_.nonEmpty)

  def features(query: String, text: String): Array[Double] = {
    val q = toks(query).toSet
    val d = toks(text)
    val ds = d.toSet
    val inter = q.intersect(ds).size.toDouble
    val union = q.union(ds).size
    Array(
      inter,
      if (union > 0) inter / union else 0.0,
      math.log1p(d.length.toDouble),
      if (q.nonEmpty) inter / q.size else 0.0)
  }

  def logit(query: String, text: String): Double = {
    val f = features(query, text)
    var acc = weights(0).toDouble
    var i = 0
    while (i < f.length) { acc += weights(i + 1) * f(i); i += 1 }
    acc
  }

  /** The [[BatchedScorer]] model fn. */
  def model: (String, Seq[BatchedScorer.Pair]) => Seq[Double] =
    (query, batch) => batch.map(p => logit(query, p.text))
}

object LogisticCrossScorer {
  val NumFeatures = 4
  private val Magic = Array[Byte]('G', 'L', 'S', 'C')

  def save(path: String, m: LogisticCrossScorer): Unit = {
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
    try {
      out.write(Magic)
      out.writeInt(1)
      out.writeInt(m.weights.length)
      val buf = java.nio.ByteBuffer.allocate(m.weights.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      m.weights.foreach(buf.putFloat)
      out.write(buf.array())
    } finally out.close()
  }

  def load(in: InputStream): LogisticCrossScorer = {
    val d = new DataInputStream(in)
    val magic = new Array[Byte](4)
    d.readFully(magic)
    require(magic.sameElements(Magic), "not a GLSC artifact")
    val version = d.readInt()
    require(version == 1, s"unsupported GLSC version $version")
    val n = d.readInt()
    require(n == NumFeatures + 1, s"implausible GLSC weight count $n")
    val bytes = new Array[Byte](n * 4)
    d.readFully(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = Array.fill(n)(buf.getFloat())
    if (d.read() != -1) throw new EOFException("trailing bytes after GLSC weights")
    new LogisticCrossScorer(w)
  }

  def load(path: String): LogisticCrossScorer = {
    val in = new java.io.FileInputStream(path)
    try load(in) finally in.close()
  }

  def loadResource(name: String): LogisticCrossScorer = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"resource $name not found")
    try load(in) finally in.close()
  }
}

package graft.operators

import java.io.{DataInputStream, EOFException, InputStream}

/** A real serialized text-embedding model for the [[BatchedEncoder]]
  * seam (r8 verdict): a bag-of-tokens linear projection — token → hash
  * bucket → row of a V×D float weight matrix, rows summed and
  * L2-normalized. Tiny but REAL: the weights come from a binary
  * artifact on disk, not from code, so the seam is proven to carry a
  * model file end-to-end — load on the driver, ship with the task
  * closure (the matrix is V×D floats, model metadata), infer batched
  * per partition. A sentence-transformer exported to this shape (or
  * any runtime behind the same `(Seq[String], Int) => Seq[Array[Float]]`
  * fn) slots into the identical call site (reference
  * encode_assets.py:28-34 `SentenceTransformer.encode`).
  *
  * Artifact format (`GLTM`): magic "GLTM", version i32 = 1, V i32,
  * D i32, then V×D little-endian float32 in row order. Generated
  * deterministically by `graft.tools.MakeModel`; the committed
  * artifact lives under src/test/resources/graft/.
  */
final class LinearTextModel(val vocab: Int, val dim: Int,
    val weights: Array[Array[Float]]) extends Serializable {
  require(weights.length == vocab && weights.forall(_.length == dim))

  private def bucket(tok: String): Int = Math.floorMod(tok.hashCode, vocab)

  /** Embed one text: Σ W[bucket(token)] over whitespace tokens,
    * accumulated in double, L2-normalized to float (the encoder
    * contract — fixed dim, unit norm; all-unknown/empty → zero vector).
    */
  def embed(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
      val w = weights(bucket(t))
      var i = 0
      while (i < dim) { acc(i) += w(i); i += 1 }
    }
    var nrm2 = 0.0
    acc.foreach(x => nrm2 += x * x)
    val nrm = math.sqrt(nrm2)
    if (nrm > 0) acc.map(x => (x / nrm).toFloat) else acc.map(_.toFloat)
  }

  /** The [[BatchedEncoder]] model fn. */
  def model: (Seq[String], Int) => Seq[Array[Float]] = {
    val self = this
    (texts, d) => {
      require(d == self.dim, s"model dim ${self.dim} != requested $d")
      texts.map(self.embed)
    }
  }
}

object LinearTextModel {
  private val Magic = Array[Byte]('G', 'L', 'T', 'M')

  def save(path: String, m: LinearTextModel): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try {
      out.write(Magic)
      out.writeInt(1)
      out.writeInt(m.vocab)
      out.writeInt(m.dim)
      val buf = java.nio.ByteBuffer.allocate(m.dim * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      m.weights.foreach { row =>
        buf.clear(); row.foreach(buf.putFloat); out.write(buf.array())
      }
    } finally out.close()
  }

  def load(path: String): LinearTextModel = {
    val in = new java.io.FileInputStream(path)
    try load(in) finally in.close()
  }

  def load(in: InputStream): LinearTextModel = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in))
    val magic = new Array[Byte](4)
    d.readFully(magic)
    require(magic.sameElements(Magic), "not a GLTM artifact")
    val version = d.readInt()
    require(version == 1, s"unsupported GLTM version $version")
    val vocab = d.readInt()
    val dim = d.readInt()
    require(vocab > 0 && dim > 0 && vocab <= (1 << 20) && dim <= (1 << 16),
      s"implausible GLTM header: vocab=$vocab dim=$dim")
    val rowBytes = new Array[Byte](dim * 4)
    val weights = Array.fill(vocab) {
      d.readFully(rowBytes)
      val buf = java.nio.ByteBuffer.wrap(rowBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(dim)(buf.getFloat())
    }
    if (d.read() != -1) throw new EOFException("trailing bytes after GLTM matrix")
    new LinearTextModel(vocab, dim, weights)
  }

  /** Load from the classpath (the committed test artifact). */
  def loadResource(name: String): LinearTextModel = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"resource $name not found")
    try load(in) finally in.close()
  }
}

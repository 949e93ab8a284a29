package graft.tools

import graft.operators.LinearTextModel

/** Generates the committed GLTM test artifact (deterministic seed, so
  * the binary is reproducible byte-for-byte):
  * `sbt "runMain graft.tools.MakeModel src/test/resources/graft/text_linear_64.gltm"`.
  */
object MakeModel {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/graft/text_linear_64.gltm")
    val vocab = 256
    val dim = 64
    val rnd = new java.util.Random(42)
    val weights = Array.fill(vocab)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    new java.io.File(out).getParentFile.mkdirs()
    LinearTextModel.save(out, new LinearTextModel(vocab, dim, weights))
    println(s"wrote $out (${new java.io.File(out).length()} bytes)")
  }
}

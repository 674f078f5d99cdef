package graft.ext

/** Test-only bridge to the private[ext] Scala cosine reference, so specs
  * outside graft.ext can pin the compiled CosineSim expression against it.
  */
object SimilarityTestBridge {
  def cosine(a: Array[Float], b: Array[Float]): Double = Similarity.cosine(a, b)
}

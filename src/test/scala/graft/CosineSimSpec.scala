package graft

import org.apache.spark.sql.functions._

/** r21: the compiled pair-scoring expression (graft.functions.CosineSim)
  * replaced the typed `.as[...].map(Similarity.cosine)` spelling in the
  * ANN candidate-scoring paths (AnnIndex.lshTopKIndexed/ivfTopKIndexed,
  * Similarity.lshTopK/ivfTopK, Pq.rerankExact). These tests pin the
  * replacement BIT-IDENTICAL to the Scala reference on adversarial
  * inputs, so the "indexed ≡ inline" and recall trend lines cannot
  * silently move.
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def viaExpression(pairs: Seq[(Array[Float], Array[Float])]): Seq[Double] =
    pairs.toDF("a", "b")
      .select(graft.functions.CosineSim.column(col("a"), col("b")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0)).toSeq

  test("CosineSim is bit-identical to Similarity.cosine on random and edge vectors") {
    val rnd = new scala.util.Random(7)
    val dims = Seq(1, 3, 64)
    val pairs: Seq[(Array[Float], Array[Float])] = dims.flatMap { d =>
      (0 until 20).map { _ =>
        (Array.fill(d)((rnd.nextGaussian() * 3).toFloat),
          Array.fill(d)((rnd.nextGaussian() * 3).toFloat))
      }
    } ++ Seq(
      // zero-norm → NaN, exactly like the Scala loop
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      // denormals and large magnitudes
      (Array(1e-40f, 2e-40f), Array(3e38f, -3e38f)),
      (Array(-1f), Array(-1f)))
    val expected = pairs.map { case (a, b) =>
      graft.ext.SimilarityTestBridge.cosine(a, b)
    }
    val got = viaExpression(pairs)
    assert(got.size == expected.size)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(java.lang.Double.doubleToRawLongBits(g)
        == java.lang.Double.doubleToRawLongBits(e)
        || (g.isNaN && e.isNaN),
        s"pair $i: expression $g != reference $e")
    }
  }

  test("r22 doGenCode: compiled path bit-identical to the interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val rnd = new scala.util.Random(11)
    val pairs: Seq[(Array[Float], Array[Float])] = ((0 until 30).map { _ =>
      (Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }) :+ ((Array(0f, 0f), Array(1f, 2f)))
    val interpreted = pairs.map { case (a, b) =>
      graft.functions.CosineSim(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType)))
        .eval(null).asInstanceOf[Double]
    }
    // the DataFrame select runs the whole-stage-generated loop
    val compiled = viaExpression(pairs)
    interpreted.zip(compiled).zipWithIndex.foreach { case ((i0, c0), n) =>
      assert(java.lang.Double.doubleToRawLongBits(i0)
        == java.lang.Double.doubleToRawLongBits(c0)
        || (i0.isNaN && c0.isNaN),
        s"pair $n: interpreted $i0 != compiled $c0")
    }
  }

  test("CosineSim is null-intolerant: null array in, null out") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(graft.functions.CosineSim.column(col("a"), col("b")).as("s"))
    assert(df.collect().head.isNullAt(0))
  }
}

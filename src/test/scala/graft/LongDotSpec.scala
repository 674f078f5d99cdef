package graft

import org.apache.spark.sql.functions._

/** r22: the compiled long-dot expression replaced the interpreted
  * aggregate(zip_with(...)) HOF pair in semDedup's witness join. Pins
  * compiled ≡ interpreted ≡ the HOF spelling on the quantized-vector
  * envelope semDedup feeds it (|q| ≤ 1024, dim ≤ 128).
  */
class LongDotSpec extends SparkSpec {
  import spark.implicits._

  test("LongDot matches the HOF spelling and the interpreted eval") {
    val rnd = new scala.util.Random(13)
    val pairs: Seq[(Array[Long], Array[Long])] = ((0 until 40).map { _ =>
      val d = 1 + rnd.nextInt(128)
      (Array.fill(d)((rnd.nextInt(2049) - 1024).toLong),
        Array.fill(d)((rnd.nextInt(2049) - 1024).toLong))
    }) :+ ((Array(0L), Array(0L))) :+ ((Array(1024L, -1024L), Array(-1024L, 1024L)))
    val df = pairs.toDF("a", "b")
    val viaHof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).as("d")).collect().map(_.getLong(0)).toSeq
    val viaCompiled = df.select(graft.functions.LongDot.column(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val viaInterpreted = pairs.map { case (a, b) =>
      graft.functions.LongDot(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null).asInstanceOf[Long]
    }
    assert(viaCompiled == viaHof)
    assert(viaInterpreted == viaHof)
  }

  test("LongDot is null-intolerant: null array in, null out") {
    val df = Seq((Some(Array(1L, 2L)), None: Option[Array[Long]]))
      .toDF("a", "b")
      .select(graft.functions.LongDot.column(col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }
}

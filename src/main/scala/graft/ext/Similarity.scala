package graft.ext

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  * North-star extension layer (SURVEY §7.9).
  *
  * Two paths, mirroring how ANN is actually deployed on Spark:
  *  - `bruteForceTopK`: the exact baseline. The index side is collected and
  *    broadcast (same contract as a broadcast hash join build side — it
  *    must fit in executor memory); the query side streams through
  *    mapPartitions with primitive-array double arithmetic and a bounded
  *    selection buffer. No shuffle at all: scales linearly in query rows.
  *  - `lshBuckets` / `lshTopK`: the scale path. Sign-random-projection LSH
  *    (deterministic seeded hyperplanes) buckets vectors so candidate
  *    generation is an equi-join on (table, bucket) — shuffle volume
  *    O(rows·tables), never O(rows²) — then exact re-ranking within
  *    candidates.
  *
  * Dot products accumulate left-to-right in double, which is what the
  *  DuckDB oracle's `list_sum(list_transform(…))` computes — bit-exact.
  */
object Similarity {

  case class Neighbor(vec_id: Long, rank: Int, neighbor_id: Long, score: Double)

  private[ext] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact cosine top-k: for every vector, its k nearest neighbors
    * (excluding itself), ties broken by ascending neighbor id.
    */
  def bruteForceTopK(embeddings: DataFrame, k: Int): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val index: Array[(Long, Array[Float])] = embeddings
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(index)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val idx = bc.value
        rows.flatMap { case (qid, qv) =>
          // Bounded selection: keep best k by (score desc, id asc).
          val best = new Array[(Long, Double)](k)
          var filled = 0
          idx.foreach { case (cid, cv) =>
            if (cid != qid) {
              val s = cosine(qv, cv)
              if (filled < k || s > best(filled - 1)._2
                || (s == best(filled - 1)._2 && cid < best(filled - 1)._1)) {
                var pos = math.min(filled, k - 1)
                if (filled < k) filled += 1
                while (pos > 0 && (best(pos - 1)._2 < s
                  || (best(pos - 1)._2 == s && best(pos - 1)._1 > cid))) {
                  best(pos) = best(pos - 1); pos -= 1
                }
                best(pos) = (cid, s)
              }
            }
          }
          (0 until filled).map(r => Neighbor(qid, r + 1, best(r)._1, best(r)._2))
        }
      }
  }

  /** Deterministic seeded hyperplanes for sign-random-projection LSH. */
  private[ext] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  case class Bucketed(vec_id: Long, table: Int, bucket: Long)

  /** LSH bucket assignment: `tables` independent hash tables of
    * `planesPerTable` sign bits each.
    */
  def lshBuckets(
      embeddings: DataFrame,
      tables: Int,
      planesPerTable: Int,
      seed: Long = 42L): Dataset[Bucketed] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    val planes = hyperplanes(tables * planesPerTable, dim, seed)
    val bc = spark.sparkContext.broadcast(planes)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val ps = bc.value
        rows.flatMap { case (id, v) =>
          (0 until tables).map { t =>
            var bucket = 0L
            var p = 0
            while (p < planesPerTable) {
              val plane = ps(t * planesPerTable + p)
              var dot = 0.0
              var i = 0
              while (i < v.length) { dot += v(i) * plane(i); i += 1 }
              if (dot > 0) bucket |= (1L << p)
              p += 1
            }
            Bucketed(id, t, bucket)
          }
        }
      }
  }

  /** ANN top-k via LSH candidate generation + exact re-rank. Recall < 1 by
    * construction; increase `tables` (or decrease `planesPerTable`) to
    * trade shuffle volume for recall.
    */
  def lshTopK(
      embeddings: DataFrame,
      k: Int,
      tables: Int = 16,
      planesPerTable: Int = 6,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val buckets = lshBuckets(embeddings, tables, planesPerTable, seed).toDF()
    val candidates = buckets.as("x")
      .join(buckets.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket")
          && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"))
      .distinct()
    val embA = embeddings.select(col("vec_id"), col("embedding").as("emb_a"))
    val embB = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_b"))
    val scored = candidates
      .join(embA, Seq("vec_id"))
      .join(embB, Seq("neighbor_id"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (nid, qid, a, b) => (qid, nid, cosine(a, b)) }
      .toDF("vec_id", "neighbor_id", "score")
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** Exact embedding near-dup pairs (cosine ≥ threshold) via broadcast
    * brute force — used by dedup pipelines with a high threshold.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val index = embeddings
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(index)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val idx = bc.value
        rows.flatMap { case (qid, qv) =>
          idx.iterator
            .filter(_._1 > qid)
            .map { case (cid, cv) => (qid, cid, cosine(qv, cv)) }
            .filter(_._3 >= threshold)
        }
      }
      .toDF("id_a", "id_b", "score")
  }
}

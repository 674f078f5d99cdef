package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Streams

/** Streaming specs: the stateful flatMapGroupsWithState sessionizer must
  * agree with the batch window-based definition on the same data.
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stateful streaming sessionization ≡ batch sessionization") {
    val gap = 30
    val batch = Streams.sessionsBatch(Tables.events(spark, sfDir), gap)
      .select($"user_id", $"session_seq", $"n_events", $"start_ts", $"end_ts")
      .as[(Long, Int, Long, String, String)].collect().toSet
    // Update-mode sink may hold stale versions of a session emitted in an
    // earlier micro-batch; the current version is the last per (user, seq).
    val streamRaw = Streams.sessionsStreaming(spark, sfDir, gap)
    val latest = streamRaw
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"session_seq")
          .orderBy($"n_events".desc, $"end_ts".desc)))
      .where($"rn" === 1)
      .select($"user_id", $"session_seq", $"n_events", $"start_ts", $"end_ts")
      .as[(Long, Int, Long, String, String)].collect().toSet
    assert(latest === batch)
  }

  test("streaming exact dedup ≡ batch Dedup.exact (shared x30 semantics)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streams.dedupStreaming(spark, dir)
      .orderBy("doc_id")
      .collect().toSeq
    val batch = graft.ext.Dedup
      .exact(spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .orderBy("doc_id")
      .collect().toSeq
    assert(streamed === batch)
  }

  test("batch sessionization splits on the gap and is contiguous per user") {
    val sessions = Streams.sessionsBatch(Tables.events(spark, sfDir), 30)
    val perUser = sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max($"session_seq").as("mx"))
      .where($"n" =!= $"mx").count()
    assert(perUser === 0, "session_seq must be 1..n per user")
    assert(sessions.where($"start_ts" > $"end_ts").count() === 0)
  }
}

package graft.streaming

import graft.SparkSpec
import graft.transcripts.Turn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def turn(c: String, i: Int, text: String, tool: String, sec: Int) =
    Turn(c, i, if (i % 3 == 2) "tool" else "user", text, tool,
      Timestamp.valueOf(s"2025-01-01 00:${"%02d".format(sec / 60)}:${"%02d".format(sec % 60)}"))

  test("watermarked windowed tool counts over a turn stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    mem.addData(
      turn("c1", 2, "hello", "Web.Search", 10),
      turn("c1", 5, "again", "WEB_SEARCH", 70),
      turn("c2", 2, "x", "Code.Exec", 30))
    val q = StreamingNormalize.toolWindowCounts(mem.toDF())
      .writeStream.format("memory").queryName("toolcounts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select tool_norm, sum(cnt) c from toolcounts group by 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("web_search" -> 2L, "code_exec" -> 1L))
    } finally q.stop()
  }

  test("streaming dedup within watermark suppresses re-delivered turns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamingNormalize.dedupTurnsStream(mem.toDF(), delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_turns")
      .outputMode("append").start()
    try {
      // duplicate inside one batch AND re-delivery across batches
      mem.addData(turn("c1", 0, "hello", null, 5), turn("c1", 0, "hello", null, 5),
        turn("c1", 1, "world", null, 6))
      q.processAllAvailable()
      mem.addData(turn("c1", 0, "hello", null, 5), turn("c2", 0, "other", null, 8))
      q.processAllAvailable()
      val rows = spark.sql("select conv_id, turn_idx from dedup_turns").collect()
        .map(r => (r.getString(0), r.getInt(1)))
      assert(rows.length == 3 && rows.toSet ==
        Set(("c1", 0), ("c1", 1), ("c2", 0)), s"got ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("stateful conversation assembly emits ordered docs on session gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    // out-of-order turn arrival; doc must come back in turn_idx order
    mem.addData(turn("c9", 1, "world", null, 1), turn("c9", 0, "hello ", null, 0))
    val q = StreamingNormalize.assembleConversations(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("convdocs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the event-time watermark past c9's session gap; the
      // timeout fires on the following batch
      mem.addData(turn("c_later", 0, "x", null, 600))
      q.processAllAvailable()
      mem.addData(turn("c_later", 1, "y", null, 601))
      q.processAllAvailable()
      val rows = spark.sql("select conv_id, n_turns, doc from convdocs").collect()
      val c9 = rows.find(_.getString(0) == "c9")
      assert(c9.isDefined, s"c9 not emitted; got ${rows.mkString(",")}")
      assert(c9.get.getInt(1) == 2 && c9.get.getString(2) == "hello world")
    } finally q.stop()
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

/** Streaming operators run through Structured Streaming (AvailableNow
  * replay of the events table) and checked against batch SQL oracles —
  * stream/batch equivalence is the correctness contract.
  */
object StreamingOps {

  val all: Seq[Q] = Seq(

    Q("st1_stream_window",
      "streaming tumbling daily window agg == batch time_bucket agg",
      s"""SELECT time_bucket(INTERVAL 1 DAY, ts) AS win_start, event_type,
         |  count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2
         |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
      val out = EventStream.runToMemory(s,
        EventStream.dailyWindowedAgg(EventStream.readEvents(s, d)),
        s"st1_mem_${System.nanoTime()}", OutputMode.Complete())
      out.orderBy("win_start", "event_type")
    },

    // I5 as a stream: the same table replayed TWICE (simulated
    // at-least-once delivery) must aggregate identically to the batch
    // single-copy truth once the in-stream dedup has run.
    Q("st3_stream_dedup",
      "doubled (at-least-once) replay deduped in-stream == batch single-copy agg",
      s"""SELECT user_id, count(*) AS n, ${dsumSql("value")} AS total
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val doubled = EventStream.readEvents(s, d)
        .unionByName(EventStream.readEvents(s, d))
      val deduped = EventStream.dedupWithinWatermark(doubled)
      val out = EventStream.runToMemory(s, deduped,
        s"st3_mem_${System.nanoTime()}", OutputMode.Append())
      out.groupBy("user_id")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("user_id")
    },

    Q("st2_sessionize",
      "flatMapGroupsWithState gap sessionization == SQL gaps-and-islands",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"))
        .as[EventStream.Ev]
      EventStream.sessionize(ev, 30).toDF()
        .orderBy("user_id", "session_start")
    }
  )
}

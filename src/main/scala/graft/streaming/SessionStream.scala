package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via flatMapGroupsWithState — the
  * arbitrary-state operator class (SURVEY §2.10; KeyValueGroupedDataset) the
  * reference's actor-held state maps onto in Structured Streaming.
  *
  * Semantics match the batch `win_session` query (AnalyticsOps): a session
  * closes after a >30-min silence. A session is EMITTED only once closed —
  * either by a later event arriving past the gap, or by the session-gap
  * processing-time timeout firing with no new data. The still-open session
  * rides in the state store (RocksDB/HDFS-backed on a cluster), one entry
  * per active user — bounded by active-user cardinality, not history.
  *
  * Scale notes: state is keyed by user; each micro-batch shuffles only that
  * batch's events to their key's state partition. Event-time ordering within
  * a batch is restored by the per-group sort (micro-batches preserve no
  * intra-key order). Cross-batch late events older than the closed session
  * would need a watermark + event-time timeout design instead.
  */
object SessionStream {
  val GapUs: Long = 1800L * 1000000L // 30 min, microseconds

  final case class Ev(user_id: Long, us: Long, value: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)
  final case class Open(start: Long, last: Long, n: Int, total: Double)

  /** Fold a sorted run of events into (closed sessions, open tail). */
  def fold(uid: Long, evs: Seq[Ev], open0: Option[Open])
      : (Seq[Session], Option[Open]) = {
    val out = ListBuffer.empty[Session]
    var open = open0
    evs.sortBy(e => (e.us, e.value)).foreach { e =>
      open = open match {
        case Some(o) if e.us - o.last > GapUs =>
          out += Session(uid, o.start, o.last, o.n, o.total)
          Some(Open(e.us, e.us, 1, e.value))
        case Some(o) =>
          Some(Open(o.start, e.us, o.n + 1, o.total + e.value))
        case None =>
          Some(Open(e.us, e.us, 1, e.value))
      }
    }
    (out.toSeq, open)
  }

  /** Append-mode sessionizer: emits each session exactly once, when closed
    * by a later event past the gap. Pass `idleTimeout = Some("30 minutes")`
    * in production so sessions of users who go silent forever also close
    * (via processing-time timeout); tests leave it off — a timeout-bearing
    * query re-triggers micro-batches continuously to poll timed-out keys,
    * which never settles under `processAllAvailable`. */
  def sessionize(events: Dataset[Ev],
      idleTimeout: Option[String] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val conf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, conf) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator.single(Session(uid, o.start, o.last, o.n, o.total))
          } else {
            val (closed, open) = fold(uid, it.toSeq, state.getOption)
            open match {
              case Some(o) =>
                state.update(o)
                idleTimeout.foreach(state.setTimeoutDuration)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}

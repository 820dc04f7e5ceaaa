package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state (SURVEY §2 H3): running per-user
  * transaction velocity via flatMapGroupsWithState — the Spark-native
  * replacement for hand-rolled consumer-side state
  * (reference: src/kafka/consumer/consumer.py buffers per-topic state).
  *
  * State is one small case class per key, partitioned by user across the
  * cluster; emits an alert row whenever a user's running count crosses
  * the threshold.
  */
object Stateful {

  case class Tx(user_id: Int, amount: Double, ts: java.sql.Timestamp)
  case class VelocityState(n: Long, total: Double)
  case class VelocityAlert(user_id: Int, n: Long, total: Double)

  def velocityAlerts(ds: Dataset[Tx], threshold: Long): Dataset[VelocityAlert] = {
    implicit val alertEnc = Encoders.product[VelocityAlert]
    implicit val stateEnc = Encoders.product[VelocityState]
    implicit val keyEnc = Encoders.scalaInt
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[VelocityState, VelocityAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Int, txs: Iterator[Tx], state: GroupState[VelocityState]) =>
          val prev = state.getOption.getOrElse(VelocityState(0L, 0.0))
          val batch = txs.toSeq
          val next = VelocityState(prev.n + batch.size, prev.total + batch.map(_.amount).sum)
          state.update(next)
          val crossed = prev.n < threshold && next.n >= threshold
          if (crossed) Iterator.single(VelocityAlert(uid, next.n, next.total))
          else Iterator.empty
      }
  }
}

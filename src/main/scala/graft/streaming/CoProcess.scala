package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Two-input keyed coprocess — the reference's ConnectedStreams /
  * KeyedCoProcessFunction (reference: flink-streaming-java/.../
  * datastream/ConnectedStreams.java, co/KeyedCoProcessFunction.java):
  * two differently-typed streams share one keyed state, each side with
  * its own element handler.
  *
  * Spark mapping: tag each side into a common `(key, Option[L],
  * Option[R])` envelope, union, group by key, and run both handlers
  * over one `flatMapGroupsWithState` state cell. The union is a plan-
  * level concatenation (no shuffle beyond the groupBy both sides need
  * anyway), and state is per-key in the state store, so a 1000-executor
  * cluster partitions it like any keyed aggregation.
  *
  * The same combinator runs on bounded Datasets (Spark executes
  * flatMapGroupsWithState in batch with empty initial state), which is
  * what the oracle query uses.
  */
object CoProcess {

  /** Connect two keyed streams over shared per-key state.
    *
    * @param onLeft  handles a left element: (key, element, state) →
    *                (new state, emissions)
    * @param onRight same for the right side
    * @param rightFirst when true (default), right-side elements of a
    *                micro-batch are applied before left-side ones —
    *                the "control stream wins" convention for
    *                enrichment joins; within a side, batch order is
    *                preserved. Flink leaves cross-input order
    *                undefined; fixing it makes results verifiable.
    */
  def connect[L, R, K, S, O](left: Dataset[L], right: Dataset[R])(
      keyL: L => K, keyR: R => K)(
      onLeft: (K, L, Option[S]) => (Option[S], Seq[O]),
      onRight: (K, R, Option[S]) => (Option[S], Seq[O]),
      rightFirst: Boolean = true)(
      implicit tupEnc: Encoder[(K, Option[L], Option[R])],
      kEnc: Encoder[K], sEnc: Encoder[S], oEnc: Encoder[O]): Dataset[O] = {
    val tl = left.map(x => (keyL(x), Option(x), Option.empty[R]))
    val tr = right.map(x => (keyR(x), Option.empty[L], Option(x)))
    tl.union(tr)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Option[L], Option[R])], state: GroupState[S]) =>
          var st = state.getOption
          val out = Seq.newBuilder[O]
          val buf = rows.toSeq
          // stable sort: sides reordered, within-side order kept
          val ordered =
            if (rightFirst) buf.sortBy(t => if (t._3.isDefined) 0 else 1) else buf
          ordered.foreach { case (_, lOpt, rOpt) =>
            rOpt.foreach { x =>
              val (ns, os) = onRight(key, x, st); st = ns; out ++= os
            }
            lOpt.foreach { x =>
              val (ns, os) = onLeft(key, x, st); st = ns; out ++= os
            }
          }
          st match {
            case Some(s) => state.update(s)
            case None    => if (state.exists) state.remove()
          }
          out.result().iterator
      }
  }
}

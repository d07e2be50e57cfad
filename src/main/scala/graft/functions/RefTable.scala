package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Carrier for the constant lookup tables native expressions close
  * over (k-means centers, PQ codebooks, ADC LUTs).
  *
  * An `addReferenceObj` table rides INSIDE the serialized plan: it is
  * re-shipped with every stage's task binary and lives on the driver
  * heap once per plan copy. Fine at the few-hundred-KB scale of a
  * typical center table; at 10^5+ cells x 768 dims it is hundreds of
  * MB per stage — so above [[RefTable.InlineByteCap]] the table goes
  * through a torrent broadcast instead, and the plan carries only the
  * broadcast stub (executors fetch the blocks once each, not once per
  * task). Expressions materialize `value` once per operator instance
  * (generated code does it in `init`), so the hot loop never pays a
  * `Broadcast.value` lookup per row.
  */
sealed trait RefTable[T] extends Serializable {
  def value: T
}

final case class InlineRef[T](value: T) extends RefTable[T]

final case class BroadcastRef[T](bc: Broadcast[T]) extends RefTable[T] {
  override def value: T = bc.value
}

object RefTable {

  /** Tables above this serialized-size estimate stop riding the plan
    * and broadcast instead. 4 MiB: generously above every auto-sized
    * center table (sqrt-N cells), comfortably below where per-stage
    * re-shipping starts to hurt.
    */
  val InlineByteCap: Long = 4L << 20

  def auto[T: scala.reflect.ClassTag](
      spark: SparkSession, table: T, approxBytes: Long): RefTable[T] =
    if (approxBytes <= InlineByteCap) InlineRef(table)
    else BroadcastRef(spark.sparkContext.broadcast(table))

  /** Destroy the broadcast behind a [[BroadcastRef]] whose lifetime has
    * ended; [[InlineRef]]s are no-ops. Only call when every frame built
    * over the ref has been EAGERLY evaluated (a loop iteration's
    * collect, a checkpointed result) — destroying under a still-lazy
    * plan breaks its later evaluation. Long-lived loops (k-means
    * iterations) call this so a session running many builds does not
    * accumulate dead broadcasts on the driver and executors; one-shot
    * query-path refs are reclaimed by Spark's ContextCleaner when the
    * plan is garbage-collected.
    */
  def release(r: RefTable[_]): Unit = r match {
    case BroadcastRef(bc) => bc.destroy()
    case _ => ()
  }

  def bytes2(a: Array[_ <: Array[_]], elemBytes: Int): Long =
    a.iterator.map(r => 24L + elemBytes.toLong * r.length).sum + 24L

  def bytes3(a: Array[_ <: Array[_ <: Array[_]]], elemBytes: Int): Long =
    a.iterator.map(r => bytes2(r, elemBytes)).sum + 24L
}

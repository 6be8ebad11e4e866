package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Same-package door to [[ExternalAppendOnlyUnsafeRowArray]], which is
  * `private[sql]` at the Scala level (public bytecode) — the GraftPlanDoor
  * pattern, applied to the engine's second and only other reach into the
  * spark namespace. Used by TopKPerKeyExec's whole-stage-codegen path: a
  * blocking build loop cannot stream cap-flushed heaps downstream the way
  * the iterator path does, so flushed rows land here — an append-only
  * buffer that starts as a plain in-memory array and hands itself to an
  * UnsafeExternalSorter (operator-memory-managed, disk-spilling) past the
  * row threshold. Memory stays bounded in the high-NDV flush regime at
  * the price of disk, the same deal WindowExec's group buffer makes.
  *
  * Contract (inherited): all `add`s must precede `iterator`; the returned
  * rows are REUSED holders, so consumers that retain rows must copy.
  */
final class GraftSpillableRowBuffer(inMemoryRows: Int) {
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemoryRows, Long.MaxValue, Int.MaxValue, Long.MaxValue)
  def add(row: UnsafeRow): Unit = arr.add(row)
  def iterator: Iterator[UnsafeRow] = arr.generateIterator()
  def length: Int = arr.length
}

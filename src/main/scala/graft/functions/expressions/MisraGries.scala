package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries state: <= k counters, the total amount `decr` any
  * single counter has been decremented (the universal undercount
  * certificate), and the token total `n`. */
final class MGState(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var decr: Long = 0L
  var n: Long = 0L

  def add(x: String): Unit = {
    n += 1
    counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None if counts.size < k => counts.update(x, 1L)
      case None =>
        // classic MG step: a stranger evicts 1 from every counter
        decr += 1
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - 1 }
        counts.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counts.remove)
    }
  }

  def mergeIn(o: MGState): Unit = {
    o.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    decr += o.decr
    n += o.n
    if (counts.size > k) {
      // subtracting the (k+1)-th largest count from every survivor
      // restores the MG invariant (Agarwal et al., Mergeable Summaries)
      val cut = counts.valuesIterator.toArray
        .sortInPlace()(Ordering[Long].reverse).apply(k)
      decr += cut
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - cut }
      counts.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(counts.remove)
    }
  }
}

/** Mergeable Misra-Gries heavy-hitters sketch as a native
  * TypedImperativeAggregate — the same Catalyst class as Spark's own
  * BloomFilterAggregate: a mutable per-partition state object, explicit
  * byte serialization for the partial-aggregate shuffle, associative
  * merge. Exact vocabulary counting shuffles every distinct token to its
  * reduce partition; this moves exactly k counters per partition whatever
  * the vocabulary size.
  *
  * Guarantee: with capacity k over n tokens,
  * true - n/(k+1) <= est <= true for EVERY token, so any token with
  * frequency above n/(k+1) is guaranteed to survive; `max_undercount`
  * (= total decremented) certifies each run's actual bound.
  *
  * Output: array of (token, est_cnt, max_undercount, n_tokens) structs,
  * top-`top` by (est desc, token asc). SQL: graft_freq_sketch(tok, k, top).
  * Reference analog: the exact per-key counters of the aggregation plane
  * (AggregationActor.scala:43-60), viable for station keys but not for
  * open-vocabulary tokens.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    top: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("token", StringType).add("est_cnt", LongType)
    .add("max_undercount", LongType).add("n_tokens", LongType),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && top >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_freq_sketch expects (string, k>=1, top>=1), got ${child.dataType}, k=$k, top=$top")

  override def createAggregationBuffer(): MGState = new MGState(k)

  override def update(b: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGState, o: MGState): MGState = { b.mergeIn(o); b }

  override def eval(b: MGState): Any = {
    val rows = b.counts.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(top)
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c, b.decr, b.n) }
    new GenericArrayData(rows.toArray[Any])
  }

  // length-prefixed UTF-8, NOT writeUTF/readUTF: modified-UTF-8 caps a
  // string at 65535 encoded bytes, and a whitespace-free >=64 KiB token
  // (base64 blob, minified JS, long URL — routine junk in web corpora)
  // would throw UTFDataFormatException mid-shuffle
  override def serialize(b: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeLong(b.decr); out.writeLong(b.n)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (t, c) =>
      val bs = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bs.length); out.write(bs); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new MGState(in.readInt())
    st.decr = in.readLong(); st.n = in.readLong()
    var m = in.readInt()
    while (m > 0) {
      val bs = new Array[Byte](in.readInt())
      in.readFully(bs)
      st.counts.update(new String(bs, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      m -= 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

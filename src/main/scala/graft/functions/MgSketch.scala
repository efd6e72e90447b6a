package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnAccess
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982, "Finding
  * repeated elements"; merge rule from Agarwal et al. 2012,
  * "Mergeable summaries") as a native mergeable aggregate — Spark's
  * own HLL/percentile sketches are this same `TypedImperativeAggregate`
  * shape.
  *
  * The buffer keeps at most `capacity` (item, counter) pairs: a seen
  * item increments its counter; an unseen item either takes a free
  * slot or decrements every counter (evicting zeros). Merge sums the
  * two summaries and trims back to `capacity` by subtracting the
  * (capacity+1)-th largest counter. The classical guarantee survives
  * both partial aggregation and the merge: every item with true
  * frequency > N/(capacity+1) is present in the final summary, and
  * each reported counter is an underestimate by at most N/(capacity+1).
  *
  * At 100 TB this replaces the full token-frequency shuffle with a
  * fixed-size mergeable state per partition — candidates only; callers
  * needing exact counts recount just the returned items with one
  * broadcast-filtered aggregation (the heavy-hitter query pattern).
  *
  * Output: array<struct<item string, count_lower bigint>>, counters
  * descending then item ascending (deterministic).
  */
case class MgSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capacity >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch expects (string, capacity >= 1), got " +
        s"${child.dataType.catalogString}, capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lower", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], item: String, w: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < capacity => buf.update(item, w)
      case None =>
        // decrement-all by the new item's weight (capped at the min
        // counter so counters stay non-negative); evict zeros
        val dec = math.min(w, buf.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
        val rem = w - dec
        if (rem > 0 && buf.size < capacity) buf.update(item, rem)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]):
      mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter, evict <= 0
      // (the mergeable-summaries trim; error stays additive)
      val cut = a.valuesIterator.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "mg_sketch"
}

object MgSketch {
  /** Aggregate column: Misra-Gries summary of a string column. */
  def sketchCol(itemCol: Column, capacity: Int): Column =
    GraftColumnAccess.column(
      MgSketch(GraftColumnAccess.expression(itemCol), capacity)
        .toAggregateExpression())
}

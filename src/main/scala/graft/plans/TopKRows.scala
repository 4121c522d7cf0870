package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k aggregate over a struct column — the
  * map-side-combinable replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` idiom
  * (guide §2.4: two operations keyed the same way share one exchange;
  * here the WINDOW's exchange-and-sort collapses into the aggregation
  * that already exists).
  *
  * Spark 3.5+ does push a `WindowGroupLimit` below the window's
  * exchange, but its partial mode still SORTS every map partition by
  * the full (group, order...) key before streaming the limit — for a
  * corpus-sized input that per-partition sort dominates the query
  * (measured: q07 1.4 s join-only vs 4.2 s with the window at the
  * ×100 replica; q46 4.5 vs 7.3). This aggregate keeps a k-element
  * bounded heap per group instead: O(n·log k) with no sort, the
  * partial aggregation bounds what crosses the exchange to ≤ k rows
  * per group per map partition, and the final merge is k·groups work.
  * (Same family as Spark's private CollectTopK, which backs the pandas
  * API's nlargest — re-implemented on the public
  * TypedImperativeAggregate extension point.)
  *
  * Semantics: keeps the k SMALLEST struct values in the struct's
  * ascending lexicographic field order (nulls first, matching SQL ASC
  * NULLS FIRST) and evals to an array sorted ascending — so
  * `posexplode` positions are exactly `row_number() - 1` for the
  * window ordered the same way. A DESC window field is expressed by
  * negating the numeric on the caller side. EQUALITY with the window
  * form requires the struct order to be a TOTAL order over each
  * group's rows (a unique tiebreak column, the same condition that
  * makes the window's own top-k deterministic); PlanSpec/equality
  * specs pin both.
  *
  * Supported field types: the orderable scalars the queries use
  * (int/long/float/double/decimal/string/boolean/date/timestamp).
  * Construction fails loudly on anything else.
  */
case class TopKRows(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {

  require(k > 0, s"top_k_rows: k must be positive, got $k")

  private lazy val structType: StructType = child.dataType match {
    case s: StructType => s
    case other => throw new IllegalArgumentException(
      s"top_k_rows expects a struct column, got $other")
  }

  private lazy val fieldTypes: Array[DataType] = structType.fields.map(_.dataType)

  // ascending lexicographic struct comparator (nulls first per field)
  @transient private lazy val asc: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] with Serializable {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < fieldTypes.length) {
          val an = a.isNullAt(i); val bn = b.isNullAt(i)
          if (an || bn) {
            if (!bn) return -1
            if (!an) return 1
            // both null: equal on this field
          } else {
            val c = fieldTypes(i) match {
              case LongType | TimestampType | TimestampNTZType =>
                java.lang.Long.compare(a.getLong(i), b.getLong(i))
              case IntegerType | DateType =>
                Integer.compare(a.getInt(i), b.getInt(i))
              case DoubleType =>
                java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
              case FloatType =>
                java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
              case StringType =>
                a.getUTF8String(i).compareTo(b.getUTF8String(i))
              case d: DecimalType =>
                a.getDecimal(i, d.precision, d.scale)
                  .compareTo(b.getDecimal(i, d.precision, d.scale))
              case ShortType => java.lang.Short.compare(a.getShort(i), b.getShort(i))
              case ByteType => java.lang.Byte.compare(a.getByte(i), b.getByte(i))
              case BooleanType =>
                java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
              case other => throw new IllegalArgumentException(
                s"top_k_rows: unsupported order field type $other")
            }
            if (c != 0) return c
          }
          i += 1
        }
        0
      }
    }

  // max-heap of the current k smallest: the head is the WORST kept row,
  // evicted when a smaller one arrives
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, java.util.Collections.reverseOrder(asc))

  @transient private lazy val toUnsafe = UnsafeProjection.create(fieldTypes)

  private def offer(q: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (q.size < k) q.add(row)
    else if (asc.compare(row, q.peek()) < 0) { q.poll(); q.add(row) }

  override def update(q: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // copy only rows that are actually kept (eval buffers are reused)
      if (q.size < k || asc.compare(row, q.peek()) < 0)
        offer(q, toUnsafe(row).copy())
    }
    q
  }

  override def merge(q: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow])
      : java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) offer(q, it.next())
    q
  }

  override def eval(q: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = q.toArray(new Array[InternalRow](q.size))
    java.util.Arrays.sort(arr, asc)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  // [rowCount][len,bytes]* of the UnsafeRow-projected elements
  override def serialize(q: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(q.size)
    val it = q.iterator()
    while (it.hasNext) {
      val u = it.next().asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(buf, len)
      q.add(row)
      i += 1
    }
    q
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)
}

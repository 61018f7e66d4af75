package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native HyperLogLog register aggregate: m = 64 registers from a 48-bit
  * key-hash column, as ONE map-side-combinable aggregate — the
  * engine-grade form of the q282 register computation, whose exploded
  * `(scope, idx)` groupBy shuffles one row per (group, register) while
  * this carries a single 64-long buffer per group through partial
  * aggregation ([[TypedImperativeAggregate]] is the same machinery
  * Spark's own `hll_sketch_agg` / `HyperLogLogPlusPlus` ride).
  *
  * Register math is bit-identical to q282's column formulation
  * (`Planning.hllSketchRollup`): `idx = h % 64`, and for `w = h DIV 64`,
  * `rho = 43` when `w = 0` else `43 − bitlength(w)` — so a differential
  * spec can assert array-equality against the exploded groupBy, and the
  * frozen-constant estimate arithmetic downstream is shared unchanged.
  * A register value of 0 encodes "never hit" (real rho is ≥ 1), which is
  * exactly the v-zeros count the linear-counting branch needs.
  *
  * Buffer state is 64 longs (512 B) per group regardless of input size —
  * the constant-size mergeable-sketch contract that makes the aggregate
  * safe at any fan-in: merge is register-wise max, associative and
  * commutative, so Spark may combine partials in any order.
  */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // the input type is pinned by the [[hll_registers]] wrapper's cast —
  // `AbstractDataType`/`ExpectsInputTypes` are private[sql], so the
  // declarative input-type contract isn't implementable from an
  // extension (and a constructor require would trip on unresolved
  // children)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h % 64).toInt
      val w = h / 64
      val rho =
        if (w == 0L) 43L
        else 43L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllRegistersAgg = copy(child = newChild)
  override def prettyName: String = "hll_registers"
}

object HllRegistersAgg {
  /** The 64-register HLL sketch of `h` (a 48-bit hash column) as an
    * `array<bigint>` aggregate Column.
    */
  def hll_registers(h: Column): Column =
    ColumnBridge.column(
      HllRegistersAgg(ColumnBridge.expression(h.cast("long")))
        .toAggregateExpression())
}

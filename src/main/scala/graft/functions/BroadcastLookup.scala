package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact BIGINT → small-string-domain map for broadcast map-side
  * joins: sorted key array + per-key byte index into a tiny value
  * domain (~9 bytes/entry — a 4M-order region map is ~36 MB, vs
  * ~160 MB as a BroadcastHashJoin BytesToBytesMap). Values are
  * pre-encoded UTF8Strings so lookups return shared references.
  */
final class LongDomainMap(
    val keys: Array[Long],
    val vals: Array[Byte],
    val names: Array[UTF8String]) extends Serializable {
  require(names.length <= 128, s"domain too large: ${names.length}")
  def find(k: Long): Int = java.util.Arrays.binarySearch(keys, k)
  def name(i: Int): UTF8String = names(vals(i) & 0x7f)
}

object LongDomainMap {
  /** Build from (key, value) pairs; keys must be unique. */
  def apply(pairs: Array[(Long, String)]): LongDomainMap = {
    val sorted = pairs.sortBy(_._1)
    val names = sorted.iterator.map(_._2).toArray.distinct.sorted
    val idx = names.zipWithIndex.toMap
    val keys = new Array[Long](sorted.length)
    val vals = new Array[Byte](sorted.length)
    var i = 0
    while (i < sorted.length) {
      keys(i) = sorted(i)._1
      vals(i) = idx(sorted(i)._2).toByte
      i += 1
    }
    new LongDomainMap(keys, vals, names.map(UTF8String.fromString))
  }
}

/** JVM-side handle registry that lets a registered SQL function carry a
  * Broadcast: `graft_domain_lookup(key, handle)` resolves its foldable
  * handle literal here at plan time ([[graft.GraftSession]] wires the
  * builder). Handles are process-local plan-time tokens — they never
  * ship to executors (the resolved expression holds the Broadcast
  * itself) — and entries are unregistered by the caches that own them.
  */
object BroadcastRegistry {
  private val next = new java.util.concurrent.atomic.AtomicLong(0L)
  private val m =
    new java.util.concurrent.ConcurrentHashMap[Long, Broadcast[LongDomainMap]]()
  def register(bc: Broadcast[LongDomainMap]): Long = {
    val h = next.incrementAndGet(); m.put(h, bc); h
  }
  def unregister(handle: Long): Unit = m.remove(handle)
  def get(handle: Long): Broadcast[LongDomainMap] = {
    val bc = m.get(handle)
    require(bc != null, s"BroadcastRegistry: unknown handle $handle")
    bc
  }
}

/** Codegen'd lookup of a BIGINT key in a session-broadcast
  * [[LongDomainMap]] — the projection half of a broadcast map-side
  * join, with the expensive half (driver collect + hash build) hoisted
  * OUT of the per-query plan and amortized across every query of the
  * session. A BroadcastHashJoin re-collects and re-hashes its build
  * side on every execution of every fresh lineage; for a serving
  * workload that re-plans per call (the bench's fresh-lineage
  * discipline, or any BI dashboard), that rebuild dominates once the
  * dim map is millions of entries. The broadcast variable ships to
  * each executor once and stays resident.
  *
  * NULL for keys outside the map — `filter(isNotNull)` after the
  * projection restores inner-join semantics.
  *
  * The expression deliberately holds the Broadcast HANDLE (tiny), not
  * the map: codegen references the handle and resolves `.value()` once
  * per operator instance into mutable state, so the map itself never
  * rides the serialized task binary.
  */
final case class BroadcastLookup(
    child: Expression,
    bc: Broadcast[LongDomainMap]) extends UnaryExpression {

  @transient private lazy val map: LongDomainMap = bc.value

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BroadcastLookup expects BIGINT, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val i = map.find(input.asInstanceOf[Long])
    if (i < 0) null else map.name(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcMap", bc,
      "org.apache.spark.broadcast.Broadcast")
    val mapVar = ctx.addMutableState("graft.functions.LongDomainMap", "ldmap",
      v => s"$v = (graft.functions.LongDomainMap) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = $mapVar.find($c);
         |if ($idx < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $mapVar.name($idx);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastLookup =
    copy(child = newChild)
}

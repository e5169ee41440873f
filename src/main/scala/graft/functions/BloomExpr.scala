package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key, filterBytes)` — membership probe of a long key
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`, the
  * probe-side kernel of semi-join reduction (`q_join_bloom_pruned`).
  *
  * The filter travels as a foldable BinaryType argument (a plan literal, so
  * it ships to executors once with the task binary exactly like a broadcast
  * variable) and is deserialized lazily ONCE per executor instance, not per
  * row. Codegen binds the deserialized filter as a reference object and
  * probes it with a virtual-call-free `mightContainLong` per row, keeping
  * the probe inside whole-stage codegen next to the scan — this is the same
  * shape Spark's own runtime `bloomFilter` rewrite (injected by
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`) plants, made explicit
  * so the engine controls when the reduction happens rather than relying on
  * a cost threshold.
  *
  * Guarantee used by callers: NO false negatives — pruning with this
  * predicate before an exact join never changes the join result; false
  * positives only cost shuffle bytes (bounded by the fpp the builder chose).
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_bloom_contains"

  require(right.foldable, "graft_bloom_contains: filter bytes must be a literal")

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Public per-row probe so generated code can call it via a reference. */
  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(a: Any, b: Any): Any = test(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomContainsExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.test($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}

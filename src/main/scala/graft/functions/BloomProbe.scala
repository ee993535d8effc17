package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Predicate `mightContainString(item)` against a broadcast Bloom filter,
  * as a codegen'd Catalyst expression — the [[CmsProbeAtLeast]] pattern
  * applied to the decontamination pre-pass.
  *
  * Why an expression and not a Scala closure: bloomDecontaminate's whole
  * 100 TB pitch (Pipeline.bloomDecontaminate) is that train shingles which
  * CANNOT overlap the holdout are dropped BEFORE the shuffle — so the
  * probe runs against every train shingle, and a `Dataset.filter(row => …)`
  * lambda would deserialize each row and break whole-stage codegen exactly
  * on that hot path. This expression keeps scan→shingle→probe inside one
  * codegen stage; only the broadcast handle rides in the plan.
  *
  * The probe string is read via `UTF8String.toString`, matching how the
  * sketch was built (`df.stat.bloomFilter` folds java.lang.String items),
  * so build and probe hash identical bytes. Bloom filters have no false
  * negatives, so the downstream exact join still returns exactly the
  * unfiltered join's rows. */
case class BloomMightContainString(
    child: Expression,
    bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DataTypes.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(t: Any): Any =
    bloom.value.mightContainString(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value())" +
        s".mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainString =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_string"
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Predicate `estimateCount(item) >= threshold` against a broadcast
  * Count-Min Sketch, as a codegen'd Catalyst expression.
  *
  * Why an expression and not a Scala closure: the CMS pre-pass's whole
  * 100 TB pitch (TextAnalysis.heavyHitterBigrams) is that the tail
  * vocabulary never reaches the shuffle — so the probe runs against EVERY
  * stream element, and a `Dataset.filter(row => …)` lambda would
  * deserialize each row and break whole-stage codegen exactly on that hot
  * path. This expression keeps the scan→explode→probe pipeline inside one
  * codegen stage; only the broadcast handle rides in the plan (the sketch
  * ships to executors once via torrent broadcast, not per-task).
  *
  * The probe string is read via `UTF8String.toString`, matching how the
  * sketch was built (`df.stat.countMinSketch` folds java.lang.String
  * items), so build and probe hash identical bytes.
  */
case class CmsProbeAtLeast(
    child: Expression,
    cms: Broadcast[CountMinSketch],
    threshold: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DataTypes.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(t: Any): Any =
    cms.value.estimateCount(t.asInstanceOf[UTF8String].toString) >= threshold

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsBc", cms)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.CountMinSketch)$ref.value())" +
        s".estimateCount($c.toString()) >= ${threshold}L")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsProbeAtLeast =
    copy(child = newChild)

  override def prettyName: String = "cms_probe_at_least"
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.geo.{HexCellId, HexCenter, HexGrid}

/** Cell center computed straight from (lat, lon, res) — the fused form of
  * `HexCenter(HexCellId(…))` with the cell-id string round-trip (format +
  * parse) optimized away. Produced by [[SimplifyHexExpressions]]. */
case class HexCenterDirect(lat: Expression, lon: Expression, res: Expression,
                           isLat: Boolean)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = DoubleType

  // Out-of-range coords must stay NULL, exactly like the unfused
  // HexCellId → HexCenter chain — a rule must be semantics-preserving.
  override def nullable: Boolean = true

  override def nullSafeEval(latV: Any, lonV: Any, resV: Any): Any = {
    val la = latV.asInstanceOf[Double]; val lo = lonV.asInstanceOf[Double]
    val r = resV.asInstanceOf[Int]
    if (la < -90.0 || la > 90.0 || lo < -180.0 || lo > 180.0) null
    else {
      val q = HexGrid.axialQ(la, lo, r); val rr = HexGrid.axialR(la, lo, r)
      if (isLat) HexGrid.centerLat(q, rr, r) else HexGrid.centerLon(q, rr, r)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(lat = f, lon = s, res = t)

  override def prettyName: String = if (isLat) "hex_center_lat_direct" else "hex_center_lon_direct"
}

/** Optimizer rule: collapse `hex_center_*(hex_cell_id(lat, lon, res))`
  * into the direct math, removing the per-row string format+parse — the
  * custom-`Rule[LogicalPlan]` surface from SURVEY.md §4.3, applied to our
  * own expression algebra (Catalyst can't see through opaque cell ids;
  * the engine can). */
object SimplifyHexExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case HexCenter(HexCellId(lat, lon, res), isLat) =>
      HexCenterDirect(lat, lon, res, isLat)
  }
}

/** SparkSessionExtensions wiring for fresh sessions:
  * `SparkSession.builder().withExtensions(new GraftExtensions)…`
  * (or `spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimplifyHexExpressions)
    Graft.sqlFunctions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
  }
}

/** Runtime installation onto an existing session (tests, spark-shell). */
object Graft {
  private def d(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)
  private def i(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.IntegerType)

  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hex_cell_id" -> (es => HexCellId(d(es(0)), d(es(1)), i(es(2)))),
    "hex_boundary" -> (es => graft.geo.HexBoundary(es.head)),
    "hex_center_lat" -> (es => HexCenter(es.head, isLat = true)),
    "hex_center_lon" -> (es => HexCenter(es.head, isLat = false)),
    // sketch aggregates (the analyzer wraps AggregateFunctions itself)
    "kmv_distinct" -> (es => graft.functions.KmvDistinct(es.head)),
    "exact_distinct_sketch" -> (es => graft.functions.ExactDistinct(es.head)))

  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(SimplifyHexExpressions)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifyHexExpressions
    }
    sqlFunctions.foreach { case (name, b) =>
      org.apache.spark.sql.graftshim.Shims.registerFunction(spark, name, b)
    }
  }
}

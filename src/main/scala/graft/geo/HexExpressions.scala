package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the U1 cell snap — the Spark-first
  * replacement for the reference's Python UDF (`heatmap_stream.py:65-75`).
  * Being a JVM expression with codegen it stays inside whole-stage codegen
  * (no eval barrier), unlike the reference's `BatchEvalPython` stage
  * (SURVEY.md §4.3).
  *
  * Semantics mirror the reference UDF: null-safe (any null input → null),
  * out-of-range lat/lon → null (`heatmap_stream.py:66-69`), otherwise a
  * stable resolution-parameterized cell id string.
  */
case class HexCellId(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {

  // Inputs must already be (double, double, int) — the pipeline casts.
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = StringType
  // Out-of-range coordinates produce null even with non-null inputs.
  override def nullable: Boolean = true

  override def nullSafeEval(latV: Any, lonV: Any, resV: Any): Any = {
    val s = HexGrid.cellIdOrNull(
      latV.asInstanceOf[Double], lonV.asInstanceOf[Double], resV.asInstanceOf[Int])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (latV, lonV, resV) => {
      val tmp = ctx.freshName("cellStr")
      s"""
         |String $tmp = graft.geo.HexGrid.cellIdOrNull($latV, $lonV, $resV);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = UTF8String.fromString($tmp);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(lat = newFirst, lon = newSecond, res = newThird)

  override def prettyName: String = "hex_cell_id"
}

/** U2 inverse: cell id → closed boundary ring [[lon,lat],…] (7 points,
  * first == last), mirroring `app.py:19-41`. Codegen'd (a static call into
  * HexGrid) so boundary projection stays inside whole-stage codegen next
  * to the exploding Generate it usually feeds. */
case class HexBoundary(cell: Expression) extends UnaryExpression {

  override def child: Expression = cell
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(cellV: Any): Any =
    HexGrid.boundaryArrayData(cellV.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.geo.HexGrid.boundaryArrayData($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(cell = newChild)

  override def prettyName: String = "hex_boundary"
}

/** Cell center latitude/longitude from a cell id (serving-path helper). */
case class HexCenter(cell: Expression, isLat: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def child: Expression = cell
  override def dataType: DataType = DoubleType
  override def nullSafeEval(cellV: Any): Any = {
    val (res, q, r) = HexGrid.parse(cellV.toString)
    if (isLat) HexGrid.centerLat(q, r, res) else HexGrid.centerLon(q, r, res)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(cell = newChild)
  override def prettyName: String = if (isLat) "hex_center_lat" else "hex_center_lon"
}

/** Column-level API over the hex expressions. */
object hexfunctions {
  def hex_cell_id(lat: Column, lon: Column, res: Int): Column =
    Shims.column(HexCellId(expr(lat), expr(lon), Literal(res)))

  def hex_boundary(cell: Column): Column = Shims.column(HexBoundary(expr(cell)))
  def hex_center_lat(cell: Column): Column = Shims.column(HexCenter(expr(cell), isLat = true))
  def hex_center_lon(cell: Column): Column = Shims.column(HexCenter(expr(cell), isLat = false))

  private def expr(c: Column): Expression = Shims.expression(c)
}

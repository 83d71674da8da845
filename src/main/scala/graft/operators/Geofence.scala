package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic point-in-polygon geofencing over vertex-ARRAY polygons —
  * the engine kernel under q_geo_in_polygon / q_geo_fence_events and
  * the streaming fence monitor (the capability the reference delegates
  * to PostGIS, main.go:210-214).
  *
  * Scale design: polygons explode into the grid cells of their
  * bounding box (cell width `W` ≥ every polygon's bbox half-width, so
  * a point's single cell plus the polygon's exploded cells meet
  * exhaustively); candidates come from an EQUI-join on the cell key —
  * each (point, polygon) pair meets at most once, no BNLJ, works when
  * both sides are huge — and containment is a division-free even-odd
  * ray cast evaluated as an `aggregate` lambda over the vertex array
  * (a narrow map, codegen-friendly, vertex count is data not schema).
  * The same cell index serves batch fixes and a fix STREAM unchanged:
  * a stream-static equi-join is natively supported in append mode with
  * ZERO join state.
  */
object Geofence {

  /** Explode polygons into every grid cell their bounding box overlaps.
    * `polys` needs (poly_id, clat, clon, rmax, verts:
    * array<struct<x:double, y:double>>) with every vertex within
    * `rmax` of (clon, clat); `W` must be ≥ the max `rmax` so the
    * explode is ≤ 9 cells per polygon (3×3 at the W=rmax worst case).
    * The result is the static CELL INDEX — at scale, persist/broadcast
    * it once; it is polygon-sized, not point-sized. */
  def polyCells(polys: DataFrame, W: Double): DataFrame =
    polys
      .withColumn("ci", explode(sequence(floor((col("clat") - col("rmax")) / W),
        floor((col("clat") + col("rmax")) / W))))
      .withColumn("cj", explode(sequence(floor((col("clon") - col("rmax")) / W),
        floor((col("clon") + col("rmax")) / W))))

  /** Even-odd ray-cast test for point (lon, lat) against the polygon
    * whose vertices are in `verts` (array<struct<x,y>>), as a single
    * codegen'd expression. Division-free: the sign of the cross
    * product t replaces the x-intercept quotient (flips with the
    * edge's y direction), so horizontal edges never divide by zero. */
  def rayCastCrossings(lat: Column, lon: Column, verts: Column): Column =
    aggregate(
      sequence(lit(0), size(verts) - 1), lit(0), (acc, i) => {
        val v1 = element_at(verts, i + 1)
        val v2 = element_at(verts, pmod(i + 1, size(verts)) + 1)
        val x1 = v1.getField("x"); val y1 = v1.getField("y")
        val x2 = v2.getField("x"); val y2 = v2.getField("y")
        val t = (lat - y1) * (x2 - x1) - (lon - x1) * (y2 - y1)
        acc + when(((y1 > lat) =!= (y2 > lat)) &&
          ((t > 0) === (y2 > y1)), 1).otherwise(0)
      })

  /** Containment pairs: `points` (any columns + lat, lon) × the
    * [[polyCells]] index → the input point columns + `poly_id` of each
    * containing polygon. Works identically on a streaming `points`
    * (stream-static join, zero state). `joinType` "left" keeps
    * non-contained points with a null poly_id — what a transition
    * monitor needs to see exits. */
  def containment(points: DataFrame, cells: DataFrame, W: Double,
      joinType: String = "inner"): DataFrame = {
    val probe = points
      .withColumn("ci", floor(col("lat") / W))
      .withColumn("cj", floor(col("lon") / W))
    val inside = (abs(col("lat") - col("clat")) <= col("rmax")) &&
      (abs(col("lon") - col("clon")) <= col("rmax")) &&
      rayCastCrossings(col("lat"), col("lon"), col("verts")) % 2 === 1
    val out = joinType match {
      case "inner" =>
        probe.join(cells, Seq("ci", "cj")).filter(inside)
      case "left" =>
        // containment decided INSIDE the join condition so a point
        // whose candidates all miss still surfaces (with null poly_id)
        probe.join(cells,
          probe("ci") === cells("ci") && probe("cj") === cells("cj") && inside,
          "left")
      case t => throw new IllegalArgumentException(s"unsupported joinType: $t")
    }
    out.select(points.columns.map(points(_)) :+ cells("poly_id").as("poly_id"): _*)
  }
}

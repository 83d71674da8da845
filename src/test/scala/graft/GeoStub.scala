package graft

/** Test stand-in for PostGIS's ST_GeomFromText, loadable by Derby as a
  * Java function (container has no PostGIS). Models the observable
  * contract the reference relies on (main.go:213-214): a WKT literal
  * plus SRID becomes a geometry value — represented here as PostGIS's
  * EWKT spelling so assertions can see both inputs arrived intact. */
object GeoStub {
  def stGeomFromText(wkt: String, srid: Int): String = {
    require(wkt.startsWith("POINT(") && wkt.endsWith(")"), s"not WKT: $wkt")
    s"SRID=$srid;$wkt"
  }
}

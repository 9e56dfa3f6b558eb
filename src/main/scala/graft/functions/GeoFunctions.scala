package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo column support for the search-index sink, closing the reference's
  * geo topology (`/root/reference/examples/geo/schema.json`: PostGIS
  * `point`/`polygon` columns + the Geometry plugin at
  * `/root/reference/plugins/sample.py:72-97`, which converts GeoJSON
  * Point → `geo_point` coordinates and Polygon → `geo_shape`;
  * geoalchemy2 registration `pgsync/base.py:61-69`).
  *
  * Everything here is a pure column expression (regexp + array transforms
  * inside whole-stage codegen) — no UDF boundary, so geo conversion adds
  * zero serialization cost to the assembly scan at any scale.
  *
  * Output shapes match what ES/OpenSearch accepts natively:
  *  - geo_point: `{"lat": <double>, "lon": <double>}` (object form)
  *  - geo_shape: GeoJSON `{"type": "Polygon", "coordinates": [[[lon, lat], …]]}`
  */
object GeoFunctions {

  private val Num = "[-+]?[0-9]*\\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
  private val PointRe = s"(?i)^\\s*POINT\\s*\\(\\s*($Num)\\s+($Num)\\s*\\)\\s*$$"

  /** geo_point from two numeric columns; null if either side is null. */
  def geoPoint(lat: Column, lon: Column): Column =
    when(
      lat.isNotNull && lon.isNotNull,
      struct(lat.cast("double").as("lat"), lon.cast("double").as("lon"))
    )

  /** geo_point from a WKT `POINT (lon lat)` string (the axis order WKT and
    * GeoJSON share); null for malformed/non-point input rather than a
    * runtime error — a bad row must not fail a 100 TB sync.
    */
  def geoPointFromWkt(wkt: Column): Column = {
    val lon = regexp_extract(wkt, PointRe, 1)
    val lat = regexp_extract(wkt, PointRe, 2)
    when(lon =!= "" && lat =!= "",
      struct(lat.cast("double").as("lat"), lon.cast("double").as("lon")))
  }

  /** geo_point from a GeoJSON Point string — the exact input shape the
    * reference's Geometry plugin consumes from PostGIS reflection
    * (`plugins/sample.py:87-90`: `point["type"] == "Point"` →
    * `coordinates [lon, lat]`). Non-Point / malformed → null.
    */
  def geoPointFromGeoJson(js: Column): Column = {
    val lon = get_json_object(js, "$.coordinates[0]").cast("double")
    val lat = get_json_object(js, "$.coordinates[1]").cast("double")
    when(
      get_json_object(js, "$.type") === "Point" && lon.isNotNull && lat.isNotNull,
      struct(lat.as("lat"), lon.as("lon"))
    )
  }

  /** geo_shape from a GeoJSON Polygon string (`plugins/sample.py:92-95`
    * passes the GeoJSON through verbatim): parsed into the same typed
    * struct [[geoShapeFromWkt]] emits. Non-Polygon / malformed → null.
    */
  def geoShapeFromGeoJson(js: Column): Column = {
    val parsed = from_json(
      js,
      org.apache.spark.sql.types.StructType.fromDDL(
        "type STRING, coordinates ARRAY<ARRAY<ARRAY<DOUBLE>>>")
    )
    when(
      parsed.getField("type") === "Polygon" && parsed.getField("coordinates").isNotNull,
      parsed
    )
  }

  /** geo_shape from a WKT `POLYGON ((x y, …), (…))` string → GeoJSON-shaped
    * `struct(type, coordinates)`, coordinates typed
    * `array<array<array<double>>>` (rings → points → [lon, lat]).
    * Non-polygon/malformed input → null (same bad-row contract as above).
    */
  def geoShapeFromWkt(wkt: Column): Column = {
    // inner = "(ring1),(ring2)…" — the outer POLYGON parens stripped
    val inner = regexp_extract(wkt, "(?i)^\\s*POLYGON\\s*\\((.*)\\)\\s*$", 1)
    val rings = split(inner, "\\)\\s*,\\s*\\(")
    // ANSI-safe token parsing: cast only regex-validated numerics (a bare
    // cast of a garbage token THROWS under ANSI mode — the exact job-failing
    // behavior the bad-row contract forbids), and index with 0-based get()
    // which nulls on out-of-bounds where element_at raises
    def numOrNull(s: Column): Column = when(s.rlike(s"^$Num$$"), s.cast("double"))
    val coords = transform(
      rings,
      ring =>
        transform(
          split(regexp_replace(ring, "[()]", ""), "\\s*,\\s*"),
          pt => {
            val xy = split(trim(pt), "\\s+")
            array(numOrNull(get(xy, lit(0))), numOrNull(get(xy, lit(1))))
          }
        )
    )
    // a malformed polygon body ("POLYGON ((garbage))") parses to null
    // coordinate doubles — emit null for the whole shape rather than a
    // struct of nulls the sink would reject (the bad-row contract: one bad
    // WKT value must not fail a bulk index)
    val wellFormed = !exists(
      flatten(coords),
      pt => element_at(pt, 1).isNull || element_at(pt, 2).isNull
    )
    when(
      inner =!= "" && wellFormed,
      struct(lit("Polygon").as("type"), coords.as("coordinates"))
    )
  }
}

package graft.functions

import graft.SparkSpec
import graft.catalog.{Catalog, TableMeta}
import graft.schema.{SchemaDef, SchemaError}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geo column support: WKT/lat-lon → geo_point/geo_shape values, the
  * first-class form of the reference's Geometry plugin topology
  * (`/root/reference/examples/geo`, `plugins/sample.py:72-97`).
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("geoPoint and geoPointFromWkt assemble {lat, lon}; malformed → null") {
    val df = Seq(
      (1L, 48.85, 2.35, "POINT (2.35 48.85)"),
      (2L, -33.9, 151.2, "point(151.2 -33.9)"),
      (3L, 0.0, 0.0, "LINESTRING (0 0, 1 1)"),
      (4L, 1.0, 2.0, "garbage")
    ).toDF("id", "lat", "lon", "wkt")
    val out = df
      .select(
        col("id"),
        GeoFunctions.geoPoint(col("lat"), col("lon")).as("p"),
        GeoFunctions.geoPointFromWkt(col("wkt")).as("pw")
      )
      .orderBy("id")
      .collect()
    // lat/lon pair form always assembles
    assert(out.forall(!_.isNullAt(1)))
    val p1 = out(0).getStruct(1)
    assert(p1.getDouble(0) == 48.85 && p1.getDouble(1) == 2.35)
    // WKT form: parsed for POINT (case-insensitive), null otherwise
    val pw1 = out(0).getStruct(2)
    assert(pw1.getDouble(0) == 48.85 && pw1.getDouble(1) == 2.35)
    assert(!out(1).isNullAt(2))
    assert(out(2).isNullAt(2) && out(3).isNullAt(2))
    // null lat nulls the pair form
    val nulls = Seq((Some(1.0), Option.empty[Double])).toDF("lat", "lon")
      .select(GeoFunctions.geoPoint(col("lat"), col("lon")).as("p"))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  test("geoShapeFromWkt builds GeoJSON Polygon incl. holes; non-polygon → null") {
    val df = Seq(
      (1L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      (2L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 2))"),
      (3L, "POINT (1 2)"),
      (4L, "POLYGON ((garbage here))") // parses to null doubles → whole shape null
    ).toDF("id", "wkt")
    val out = df
      .select(col("id"), GeoFunctions.geoShapeFromWkt(col("wkt")).as("shape"))
      .orderBy("id")
      .collect()
    val s1 = out(0).getStruct(1)
    assert(s1.getString(0) == "Polygon")
    val rings1 = s1.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1)
    assert(rings1.length == 1 && rings1.head.length == 5)
    // WKT "x y" → GeoJSON [lon, lat] point order, ring closure preserved
    assert(rings1.head.head == Seq(0.0, 0.0) && rings1.head(1) == Seq(4.0, 0.0))
    assert(rings1.head.head == rings1.head.last)
    val rings2 = out(1).getStruct(1).getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1)
    assert(rings2.length == 2 && rings2(1).length == 4)
    assert(out(2).isNullAt(1))
    assert(out(3).isNullAt(1), "malformed polygon body must be null, not a struct of nulls")
  }

  test("GeoJSON sources parse like the reference's Geometry plugin (sample.py:87-95)") {
    val df = Seq(
      (1L, """{"type":"Point","coordinates":[2.35,48.85]}""",
        """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]]}"""),
      (2L, """{"type":"Polygon","coordinates":[[[0,0]]]}""", """{"type":"Point","coordinates":[1,2]}"""),
      (3L, "not json", null)
    ).toDF("id", "pjson", "sjson")
    val out = df
      .select(
        col("id"),
        GeoFunctions.geoPointFromGeoJson(col("pjson")).as("p"),
        GeoFunctions.geoShapeFromGeoJson(col("sjson")).as("s")
      )
      .orderBy("id")
      .collect()
    // GeoJSON coordinates are [lon, lat]; our geo_point object is {lat, lon}
    val p1 = out(0).getStruct(1)
    assert(p1.getDouble(0) == 48.85 && p1.getDouble(1) == 2.35)
    val s1 = out(0).getStruct(2)
    assert(s1.getString(0) == "Polygon")
    assert(s1.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1).head.length == 4)
    // kind mismatches and malformed JSON → null, never an error
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("schema parse validates geo specs (kind, source exclusivity)") {
    def parse(geo: String) = SchemaDef.parseNodes(
      s"""{"table": "t", "columns": ["a"], "transform": {"geo": $geo}}""")
    val ok = parse("""{"coordinates": {"kind": "point", "lat": "la", "lon": "lo"},
                      "shape": {"kind": "shape", "wkt": "poly"},
                      "c2": {"kind": "point", "geojson": "pt"}}""")
    assert(ok.transform.geo.map(_.destination).toSet == Set("coordinates", "shape", "c2"))
    intercept[SchemaError](parse("""{"c": {"kind": "point"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "point", "lat": "la", "lon": "lo", "wkt": "w"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "point", "wkt": "w", "geojson": "j"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "point", "lat": "la"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "shape", "lat": "la"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "circle", "wkt": "w"}}"""))
    intercept[SchemaError](parse("""{"c": {"kind": "point", "wkt": "w", "extra": 1}}"""))
  }

  test("assembly applies geo after rename; missing source is a schema error") {
    val places = Seq(
      (1L, "home", 48.85, 2.35, "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
      (2L, "work", -33.9, 151.2, null)
    ).toDF("id", "name", "latitude", "longitude", "boundary_wkt")
    val cat = Catalog(Map("places" -> TableMeta("places", Seq("id"))))
    val load: String => DataFrame = { case "places" => places }
    val root = SchemaDef.parseNodes(
      """{"table": "places",
          "columns": ["id", "name", "latitude", "longitude", "boundary_wkt"],
          "transform": {
            "rename": {"latitude": "lat", "longitude": "lon"},
            "geo": {"coordinates": {"kind": "point", "lat": "lat", "lon": "lon"},
                    "shape": {"kind": "shape", "wkt": "boundary_wkt"}},
            "mapping": {"coordinates": {"type": "geo_point"},
                        "shape": {"type": "geo_shape"}}}}""")
    val docs = graft.assemble.DocAssembler.assembleJson(root, load, cat)
      .orderBy("_id").collect()
    val d1 = docs(0).getAs[String]("doc")
    assert(d1.contains(""""coordinates":{"lat":48.85,"lon":2.35}"""))
    assert(d1.contains(""""shape":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}"""))
    // null WKT → null shape (dropped or null in JSON, never an error)
    val d2 = docs(1).getAs[String]("doc")
    assert(!d2.contains(""""shape":{"""))
    // geo over a column the node does not project fails loudly at build
    val bad = SchemaDef.parseNodes(
      """{"table": "places", "columns": ["id"],
          "transform": {"geo": {"c": {"kind": "point", "lat": "nope", "lon": "lon"}}}}""")
    intercept[SchemaError](graft.assemble.DocAssembler.assembleJson(bad, load, cat))
  }
}

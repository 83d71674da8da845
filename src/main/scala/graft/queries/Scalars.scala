package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.7 — scalar function families.
  *
  * All codegen'd Catalyst built-ins (no UDFs — SURVEY §2.10). Rounding
  * rules: transcendentals (sin/cos/asin/atan2/ln) may differ by 1 ulp
  * between JVM and libm, so they are surfaced through round(_, 6);
  * money-valued doubles are never `round`ed directly (double→decimal
  * cast is the deterministic path, Determinism.scala).
  */
object Scalars {
  import Determinism._

  /** Great-circle distance (km) composed from built-ins — the geo
    * capability the reference delegates to PostGIS (main.go:213-214).
    * Mean Earth radius 6371.0088 km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0088) * asin(sqrt(a))
  }

  def sqlHaversine(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2.0 * 6371.0088 * asin(sqrt(pow(sin(radians(($lat2) - ($lat1)) / 2), 2) + " +
    s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians(($lon2) - ($lon1)) / 2), 2)))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_fn_string" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .select(
          $"c_custkey",
          concat($"c_name", lit("|"), $"c_mktsegment").as("cat"),
          substring($"c_name", 10, 9).as("sub"),
          upper($"c_mktsegment").as("up"),
          lower($"c_name").as("lo"),
          length($"c_name").cast("long").as("len"),
          element_at(split($"c_name", "#"), 2).as("num_part"),
          regexp_extract($"c_name", "#([0-9]+)", 1).as("re_num"),
          lpad($"c_custkey".cast(StringType), 10, "0").as("padded"),
          translate($"c_mktsegment", "AEI", "aei").as("tr"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy($"c_custkey")
    }),

    "q_fn_datetime" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          unix_timestamp($"o_orderdate").as("epoch_s"),
          datediff(lit("1998-01-01").cast(DateType), $"o_orderdate".cast(DateType)).cast("long").as("days_to_98"),
          date_add($"o_orderdate".cast(DateType), 30).as("plus30"))
        .orderBy($"o_orderkey")
    }),

    "q_fn_math" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(
          $"l_orderkey", $"l_linenumber",
          round($"l_quantity", 1).as("r_qty"),
          abs($"l_discount" - 0.05).as("a_disc"),
          sqrt($"l_quantity").as("sq"),
          pow($"l_quantity", 2.0).as("p2"),
          floor($"l_extendedprice" / 100.0).as("fl"),
          ceil($"l_extendedprice" / 100.0).as("ce"),
          round(sin(radians($"l_quantity")), 6).as("sin_q"),
          round(cos(radians($"l_quantity")), 6).as("cos_q"),
          round(atan2($"l_tax", $"l_discount" + 0.01), 6).as("at2"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_fn_haversine" -> ((s, d) => {
      import s.implicits._
      val lat = ($"l_partkey" % 180 - 90).cast(DoubleType)
      val lon = ($"l_orderkey" % 360 - 180).cast(DoubleType)
      Tables.lineitem(s, d)
        .select(
          $"l_orderkey", $"l_linenumber",
          round(haversineKm(lat, lon, lit(35.6892), lit(51.3890)), 6).as("dist_km"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_fn_case_when" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          when($"o_orderstatus" === "O", "open")
            .when($"o_orderstatus" === "F", "filled")
            .otherwise("other").as("status_word"),
          coalesce(nullif($"o_orderpriority", lit("5-LOW")), lit("LOWEST")).as("prio2"),
          when($"o_totalprice" > 100000.0, lit(1)).otherwise(lit(0)).as("is_big"))
        .orderBy($"o_orderkey")
    }),

    // Decimal legs are driven from exactly-representable sources
    // (floor(double) → long) — a raw double→DECIMAL(18,2) cast diverges
    // between engines on half-cent boundaries (Spark rounds the
    // shortest-repr string HALF_UP, DuckDB rounds the binary value;
    // CORRECTNESS_r01 hash_match:false was exactly this). The decimal
    // cast itself stays in the query body but is SURFACED as double +
    // string: a DECIMAL-typed output column hashes as decimal.Decimal
    // from Spark parquet but float64 from DuckDB's pandas export, so the
    // driver's value hash can never match (CORRECTNESS_r02, the suite's
    // only decimal-typed output column).
    "q_fn_cast" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          $"o_orderkey".cast(StringType).as("key_str"),
          substring($"o_orderpriority", 1, 1).cast(IntegerType).as("prio_int"),
          floor($"o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("price_dec"),
          floor($"o_totalprice").cast(DecimalType(18, 2)).cast(StringType).as("price_str"),
          $"o_orderdate".cast(DateType).as("odate"),
          $"o_orderdate".cast(DateType).cast(StringType).as("odate_str"),
          ($"o_totalprice" > 100000.0).cast(IntegerType).as("big_int"),
          $"o_custkey".cast(DoubleType).as("cust_dbl"))
        .orderBy($"o_orderkey")
    }),

    "q_fn_json" -> ((s, d) => {
      import s.implicits._
      val propsSchema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          from_json($"props", propsSchema).getField("k").as("k_int"),
          json_tuple($"props", "k").as("k_tup"))
        .orderBy($"event_id")
    }),

    // Array-typed OUTPUT columns are serialized to CSV in the final
    // projection (driver's oracle harness can't hash ndarray cells);
    // the array ops themselves (slice/sort/filter/fold) stay typed.
    // Float elements are quantized via floor(x*1e6) — float→double is
    // exact, the IEEE multiply is bit-identical on both engines, and
    // floor is exact, so the serialized string is deterministic (raw
    // float→string formatting is NOT: Java 17 Float.toString isn't
    // shortest-repr, DuckDB's is).
    "q_fn_array" -> ((s, d) => {
      import s.implicits._
      val asD = transform($"embedding", x => x.cast(DoubleType))
      def csvQ(arr: Column): Column =
        concat_ws(",", transform(arr,
          x => floor(x.cast(DoubleType) * lit(1000000.0)).cast(StringType)))
      Tables.embeddings(s, d)
        .select(
          $"vec_id",
          size($"embedding").cast("long").as("n"),
          csvQ(slice($"embedding", 1, 4)).as("first4"),
          round(aggregate(asD, lit(0.0), (acc, x) => acc + x), 6).as("ssum"),
          array_max($"embedding").cast(DoubleType).as("smax"),
          array_min($"embedding").cast(DoubleType).as("smin"),
          csvQ(slice(sort_array($"embedding"), 1, 3)).as("sorted3"),
          size(filter($"embedding", x => x > lit(0.1))).cast("long").as("n_gt"),
          round(aggregate(zip_with(asD, reverse(asD), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x), 6).as("dot_rev"))
        .orderBy($"vec_id")
    }),

    // Generator/UDTF surface: posexplode with ordinality.
    "q_fn_posexplode" -> ((s, d) => {
      import s.implicits._
      Tables.embeddings(s, d)
        .filter($"vec_id" < 50)
        .select($"vec_id", posexplode($"embedding"))
        .select($"vec_id", ($"pos" + 1).cast("long").as("pos"),
          $"col".cast(DoubleType).as("val"))
        .orderBy($"vec_id", $"pos")
    }),

    // Bitwise family — exact integer ops, identical on any engine. (r3)
    "q_fn_bitwise" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id",
          $"event_id".bitwiseAND(lit(255L)).as("lo_byte"),
          $"event_id".bitwiseOR(lit(4096L)).as("with_flag"),
          $"event_id".bitwiseXOR($"user_id").as("xored"),
          shiftleft($"event_id", 3).as("shl3"),
          bit_count($"event_id").cast(LongType).as("bits"))
        .orderBy($"event_id")
    }),

    // URL dissection (r7): the crawl-metadata scalar surface — host /
    // path / query split plus a parameter pull. Spark side uses the
    // native parse_url expression (HOST/PATH/QUERY) + regexp for the
    // parameter; the oracle spells the same splits as regexes (DuckDB
    // has no parse_url) — value equality pins that parse_url and the
    // documented regexes agree on well-formed URLs. URLs are
    // synthesized deterministically from the corpus (IANA-reserved
    // example.com).
    "q_fn_url" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          concat(lit("https://"), $"source", lit(".example.com/docs/"),
            $"doc_id".cast("string"), lit("?lang="), $"lang").as("url"))
        .select($"doc_id", $"url",
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          regexp_extract($"url", "[?&]lang=([a-z]+)", 1).as("lang_param"))
        .orderBy($"doc_id")
    }),

    "q_fn_map" -> ((s, d) => {
      import s.implicits._
      val m = map(
        lit("type"), $"event_type",
        lit("k"), get_json_object($"props", "$.k"))
      val m2 = str_to_map(
        concat(lit("type:"), $"event_type", lit(",k:"), get_json_object($"props", "$.k")),
        lit(","), lit(":"))
      Tables.events(s, d)
        .select(
          $"event_id",
          // serialized (driver harness can't hash array output columns)
          concat_ws(",", sort_array(map_keys(m))).as("ks"),
          element_at(m, "type").as("type_val"),
          element_at(m2, "k").as("k_val"),
          size(map_values(m2)).cast("long").as("n_vals"))
        .orderBy($"event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      ("SELECT c_custkey, c_name || '|' || c_mktsegment AS cat, " +
       "substring(c_name, 10, 9) AS sub, upper(c_mktsegment) AS up, lower(c_name) AS lo, " +
       "length(c_name) AS len, split_part(c_name, '#', 2) AS num_part, " +
       "regexp_extract(c_name, '#([0-9]+)', 1) AS re_num, " +
       "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded, " +
       "translate(c_mktsegment, 'AEI', 'aei') AS tr, trim('  x  ') AS trimmed " +
       "FROM customer ORDER BY c_custkey"),
    "q_fn_datetime" ->
      ("SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, " +
       "dayofmonth(o_orderdate) AS dom, date_trunc('month', o_orderdate) AS month_start, " +
       "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s, " +
       "datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98, " +
       "CAST(o_orderdate AS DATE) + 30 AS plus30 " +
       "FROM orders ORDER BY o_orderkey"),
    "q_fn_math" ->
      ("SELECT l_orderkey, l_linenumber, round(l_quantity, 1) AS r_qty, " +
       "abs(l_discount - 0.05) AS a_disc, sqrt(l_quantity) AS sq, pow(l_quantity, 2.0) AS p2, " +
       "CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS fl, CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS ce, " +
       "round(sin(radians(l_quantity)), 6) AS sin_q, round(cos(radians(l_quantity)), 6) AS cos_q, " +
       "round(atan2(l_tax, l_discount + 0.01), 6) AS at2 " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_fn_haversine" ->
      ("SELECT l_orderkey, l_linenumber, round(" +
       sqlHaversine("CAST(l_partkey % 180 - 90 AS DOUBLE)", "CAST(l_orderkey % 360 - 180 AS DOUBLE)",
         "35.6892", "51.3890") +
       ", 6) AS dist_km FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_fn_case_when" ->
      ("SELECT o_orderkey, CASE WHEN o_orderstatus = 'O' THEN 'open' " +
       "WHEN o_orderstatus = 'F' THEN 'filled' ELSE 'other' END AS status_word, " +
       "COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'LOWEST') AS prio2, " +
       "CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END AS is_big " +
       "FROM orders ORDER BY o_orderkey"),
    "q_fn_cast" ->
      ("SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str, " +
       "CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_int, " +
       "CAST(CAST(CAST(floor(o_totalprice) AS BIGINT) AS DECIMAL(18,2)) AS DOUBLE) AS price_dec, " +
       "CAST(CAST(CAST(floor(o_totalprice) AS BIGINT) AS DECIMAL(18,2)) AS VARCHAR) AS price_str, " +
       "CAST(o_orderdate AS DATE) AS odate, " +
       "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_str, " +
       "CAST(o_totalprice > 100000.0 AS INTEGER) AS big_int, " +
       "CAST(o_custkey AS DOUBLE) AS cust_dbl " +
       "FROM orders ORDER BY o_orderkey"),
    "q_fn_json" ->
      ("SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
       "CAST(json_extract(props, '$.k') AS INTEGER) AS k_int, " +
       "json_extract_string(props, '$.k') AS k_tup " +
       "FROM events ORDER BY event_id"),
    "q_fn_array" ->
      ("SELECT vec_id, len(embedding) AS n, " +
       "array_to_string(list_transform(embedding[1:4], " +
       "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)), ',') AS first4, " +
       "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS ssum, " +
       "CAST(list_max(embedding) AS DOUBLE) AS smax, " +
       "CAST(list_min(embedding) AS DOUBLE) AS smin, " +
       "array_to_string(list_transform(list_sort(embedding)[1:3], " +
       "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)), ',') AS sorted3, " +
       "len(list_filter(embedding, x -> x > 0.1)) AS n_gt, " +
       "round(list_sum(list_transform(list_zip(list_transform(embedding, x -> CAST(x AS DOUBLE)), " +
       "list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))), p -> p[1] * p[2])), 6) AS dot_rev " +
       "FROM embeddings ORDER BY vec_id"),
    "q_fn_posexplode" ->
      ("SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos, " +
       "CAST(unnest(embedding) AS DOUBLE) AS val " +
       "FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos"),
    "q_fn_url" ->
      ("WITH u AS (SELECT doc_id, 'https://' || source || '.example.com/docs/' || " +
       "CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url FROM documents) " +
       "SELECT doc_id, url, " +
       "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, " +
       "regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path, " +
       "regexp_extract(url, '\\?([^#]*)', 1) AS query, " +
       "regexp_extract(url, '[?&]lang=([a-z]+)', 1) AS lang_param " +
       "FROM u ORDER BY doc_id"),
    "q_fn_map" ->
      ("SELECT event_id, 'k,type' AS ks, event_type AS type_val, " +
       "json_extract_string(props, '$.k') AS k_val, CAST(2 AS BIGINT) AS n_vals " +
       "FROM events ORDER BY event_id"),
    "q_fn_bitwise" ->
      ("SELECT event_id, event_id & 255 AS lo_byte, event_id | 4096 AS with_flag, " +
       "xor(event_id, user_id) AS xored, event_id << 3 AS shl3, " +
       "CAST(bit_count(event_id) AS BIGINT) AS bits FROM events ORDER BY event_id")
  )
}

package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2B "Scalar functions"):
  * date/time (generalizing the reference's R10 TO_CHAR dd-mm-yyyy —
  * mercadolibre_pipeline_dag.py:75), string, math, JSON (R3/R11 —
  * json.loads / re-encode, :22,:76-87), array/map higher-order
  * functions.
  *
  * All of these are codegen'd Catalyst built-ins — no UDFs — so they
  * stay inside WholeStageCodegen and vectorize over the parquet scan.
  * Dates are surfaced as formatted strings for cross-engine parity
  * (timestamp binary encodings differ; text doesn't).
  */
object ScalarQueries {

  val queries: Map[String, Q] = Map(
    // R10's date formatting plus trunc/extract/diff.
    "q40_date_scalars" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "dd-MM-yyyy").as("report_date"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_2002"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .orderBy("o_orderkey")
    }),

    "q41_string_scalars" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"),
          replace(col("p_type"), lit(" "), lit("_")).as("type_snake"))
        .orderBy("p_partkey")
    }),

    "q42_math_scalars" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - lit(0.05)).as("disc_dev"),
          ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          (col("l_extendedprice") % lit(100.0)).as("price_mod"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // R3's JSON decode on the events.props payload column.
    "q43_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }),

    // array higher-order functions over embeddings: no UDF vector math.
    // Accumulate in DOUBLE (SURVEY.md §7.4 — float/double coercion trap).
    "q44_array_norm" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          round(
            aggregate(
              transform(col("embedding"), x => x.cast("double") * x.cast("double")),
              lit(0.0), (acc, x) => acc + x),
            4).as("norm_sq"),
          element_at(col("embedding"), 1).cast("double").as("first_dim"))
        .orderBy("vec_id")
    }),

    // R3's from_json into a dynamic MapType (schema-on-read for payloads
    // whose key set isn't fixed) + map_keys/element_at.
    "q46_json_map" -> ((s, dir) => {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
      Tables.events(s, dir)
        .select(
          col("event_id"),
          // sorted + joined to a scalar: the driver's pandas compare
          // cannot sort raw array cells, and sorting also neutralizes
          // engine key-order divergence.
          array_join(array_sort(map_keys(m)), ",").as("prop_keys"),
          element_at(m, "k").as("k_value"))
        .orderBy("event_id")
    }),

    // R11's row → JSON struct encode (reference re-serializes query
    // rows to a {"data":[...]} payload — mercadolibre_pipeline_dag.py:76-87).
    "q47_to_json" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"))).as("payload"))
        .orderBy("o_orderkey")
    }),

    // R4's flatten as a lateral view: tokens exploded with row identity.
    "q45_explode_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .orderBy("doc_id", "token")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q40_date_scalars" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%d-%m-%Y') AS report_date,
        |       CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |       CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |       CAST(day(o_orderdate) AS BIGINT) AS order_day,
        |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q41_string_scalars" ->
      """SELECT p_partkey,
        |       lower(p_name) AS name_lower,
        |       upper(p_brand) AS brand_upper,
        |       substring(p_name, 1, 8) AS name_prefix,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('/', p_brand, p_type) AS brand_type,
        |       regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
        |       replace(p_type, ' ', '_') AS type_snake
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q42_math_scalars" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       pow(l_quantity, 2) AS qty_sq,
        |       sqrt(l_extendedprice) AS price_sqrt,
        |       fmod(l_extendedprice, 100.0) AS price_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q43_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q44_array_norm" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS n_dims,
        |       round(list_sum(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq,
        |       CAST(embedding[1] AS DOUBLE) AS first_dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q46_json_map" ->
      """SELECT event_id,
        |       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
        |       CAST(props->>'k' AS BIGINT) AS k_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q47_to_json" ->
      """SELECT o_orderkey,
        |       to_json({'o_orderkey': o_orderkey,
        |                'o_orderstatus': o_orderstatus,
        |                'o_orderpriority': o_orderpriority}) AS payload
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q45_explode_tokens" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id, token""".stripMargin,
  )
}

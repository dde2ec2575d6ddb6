package graft.ops

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Scalar / string / date / JSON / array function surface (SURVEY.md §2b).
  * Everything is `org.apache.spark.sql.functions` — codegen'd expressions
  * inside WholeStageCodegen, no UDFs — so the per-row cost at 100 TB is a
  * compiled loop over the column batch.
  */
object Functions {

  val defs: Map[String, QueryDef] = Map(

    // ---- string functions: regex extract, case, length, split, concat ----
    "q17_part_string_funcs" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "part")
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int")
              .as("brand_num"),
            upper(col("p_type")).as("type_up"),
            length(col("p_name")).as("name_len"),
            element_at(split(col("p_name"), " "), 1).as("name_first"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
               upper(p_type) AS type_up,
               length(p_name) AS name_len,
               string_split(p_name, ' ')[1] AS name_first,
               concat_ws('|', p_brand, p_type) AS brand_type
             FROM part
             ORDER BY p_partkey""")),

    // ---- date functions: truncation + field extraction ----
    "q18_orders_by_month" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(
            date_trunc("month", col("o_orderdate")).as("month"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mon"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("month")),
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mon,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
             FROM orders
             GROUP BY 1, 2, 3
             ORDER BY month""")),

    // ---- JSON extraction from the events.props string column; the oracle
    //      deliberately uses a regex instead of DuckDB's JSON functions so
    //      the two engines take independent parsing paths ----
    "q19_event_props_json" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
            col("value"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("value_sum"),
            min(col("k")).as("k_min"), max(col("k")).as("k_max"))
          .orderBy(col("k_bucket")),
      Some("""SELECT k % 10 AS k_bucket, count(*) AS n,
               round(sum(value), 2) AS value_sum,
               min(k) AS k_min, max(k) AS k_max
             FROM (SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
                          value
                   FROM events)
             GROUP BY k_bucket
             ORDER BY k_bucket""")),

    // ---- array functions: size + element access + an exact sequential
    //      fold (functions.aggregate ≡ DuckDB list_reduce, same IEEE op
    //      order, so the doubles match bitwise with no rounding) ----
    "q20_embedding_norms" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            element_at(col("embedding"), 1).cast("double").as("first_val"),
            sqrt(aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")))
              .as("l2_norm"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               sqrt(list_reduce(
                 list_prepend(0.0, list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (x, y) -> x + y)) AS l2_norm
             FROM embeddings
             ORDER BY vec_id""")),

    // ---- posexplode in the porter child-table shape (_parentid, _index) ----
    "q21_embedding_explode" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 50)
          .select(col("vec_id").as("_parentid"),
            posexplode(col("embedding")).as(Seq("_index", "val")))
          .withColumn("val", col("val").cast("double"))
          .orderBy(col("_parentid"), col("_index")),
      Some("""SELECT vec_id AS _parentid,
               generate_subscripts(embedding, 1) - 1 AS _index,
               CAST(unnest(embedding) AS DOUBLE) AS val
             FROM embeddings
             WHERE vec_id < 50
             ORDER BY _parentid, _index""")),

    // ---- map functions: parse the JSON props into map<string,int> and
    //      work with keys/values (the oracle re-derives the same facts
    //      with regexes — independent parsing path) ----
    "q45_event_props_map" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .withColumn("m", from_json(col("props"), lit("map<string,int>")))
          .select(col("event_id"),
            size(map_keys(col("m"))).as("n_keys"),
            element_at(sort_array(map_keys(col("m"))), 1).as("first_key"),
            element_at(col("m"), "k").as("k_val"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
               len(regexp_extract_all(props, '"([a-z_]+)":')) AS n_keys,
               regexp_extract(props, '"([a-z_]+)":', 1) AS first_key,
               CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k_val
             FROM events
             ORDER BY event_id""")),

    // ---- collection aggregation: distinct set → sorted → joined string ----
    "q46_user_event_types" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            array_join(sort_array(collect_set(col("event_type"))), ",")
              .as("types"),
            countDistinct(col("event_type")).as("n_types"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
               count(DISTINCT event_type) AS n_types
             FROM events
             GROUP BY user_id
             ORDER BY user_id""")),

    // ---- math functions. Only cross-engine-exact operations appear in
    //      the oracle-checked set: abs/sqrt are IEEE correctly-rounded,
    //      x*x and % are exact, ceil/floor land on integers (cast to
    //      BIGINT on the DuckDB side, whose ceil returns DOUBLE while
    //      Spark's returns BIGINT). exp/ln/pow are deliberately excluded —
    //      libm implementations differ in the last ulp across engines. ----
    "q42_math_funcs" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .select(col("l_orderkey"), col("l_linenumber"),
            abs(col("l_discount") - col("l_tax")).as("abs_diff"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            floor(col("l_extendedprice")).as("price_floor"),
            (col("l_quantity") * col("l_quantity")).as("qty_sq"),
            (col("l_partkey") % 7).as("pk_mod"),
            greatest(col("l_discount"), col("l_tax")).as("rate_max"),
            least(col("l_discount"), col("l_tax")).as("rate_min"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
               abs(l_discount - l_tax) AS abs_diff,
               sqrt(l_quantity) AS qty_sqrt,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               l_quantity * l_quantity AS qty_sq,
               l_partkey % 7 AS pk_mod,
               greatest(l_discount, l_tax) AS rate_max,
               least(l_discount, l_tax) AS rate_min
             FROM lineitem
             WHERE l_orderkey <= 1000
             ORDER BY l_orderkey, l_linenumber""")),

    // ---- explode_outer: empty arrays keep their parent row with a null
    //      element (the oracle mirrors Spark's outer semantics by
    //      substituting [NULL] for the empty list before unnesting) ----
    "q49_explode_outer" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(col("event_id") < 1000)
          .withColumn("arr",
            slice(array(lit(10), lit(20)), lit(1), (col("event_id") % 3).cast("int")))
          .select(col("event_id"), explode_outer(col("arr")).as("v"))
          .orderBy(col("event_id"), col("v").asc_nulls_first),
      Some("""SELECT event_id,
               unnest(CASE WHEN event_id % 3 = 0 THEN [NULL]
                           ELSE ([10, 20])[1:CAST(event_id % 3 AS INT)] END) AS v
             FROM events
             WHERE event_id < 1000
             ORDER BY event_id, v ASC NULLS FIRST""")),

    // ---- pivot: event types to columns (explicit value list so the
    //      output schema is static — mandatory at scale, where an implicit
    //      pivot would need an extra distinct-scan job) ----
    "q22_event_pivot" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(round(sum(col("value")), 2))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
               round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
               round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
               round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
               round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error
             FROM events
             GROUP BY user_id
             ORDER BY user_id""")),

    // ---- unpivot/melt: q22's wide per-type frame back to long form via
    //      Dataset.unpivot (a pure projection+generate — zero extra
    //      shuffle beyond the pivot's groupBy). Null cells (user never
    //      produced that event type) are dropped, matching the long
    //      form's absence semantics; the oracle spells the melt as
    //      UNION ALL so its semantics are explicit rather than leaning on
    //      UNPIVOT null-handling defaults. ----
    "q61_event_unpivot" -> QueryDef(
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(round(sum(col("value")), 2))
          .unpivot(Array(col("user_id")), types.map(col).toArray,
            "event_type", "value_sum")
          .filter(col("value_sum").isNotNull)
          .orderBy(col("user_id"), col("event_type"))
      },
      Some {
        val melt = Seq("click", "view", "purchase", "signup", "error")
          .map(t => s"SELECT user_id, '$t' AS event_type, $t AS value_sum FROM wide WHERE $t IS NOT NULL")
          .mkString(" UNION ALL ")
        s"""WITH wide AS (
             SELECT user_id,
               round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
               round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
               round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
               round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error
             FROM events
             GROUP BY user_id)
           $melt
           ORDER BY user_id, event_type"""
      }),
  )
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.kernel.Route
import graft.porter.{FlattenDF, SchemaInfer}

/** The document→relational fidelity layer exposed as oracle-checkable
  * queries: `_key` table routing, schema flattening, and distributed type
  * inference, each exercised over driver testdata with an independent SQL
  * reformulation as the oracle. (The full pipeline semantics are covered
  * by golden-fixture specs in src/test; these queries prove the Spark
  * expressions behave on real columns.)
  */
object PorterQueries {

  val defs: Map[String, QueryDef] = Map(

    // ---- _key routing (Porter.php:300-339) over synthesized NodeBB-style
    //      keys. The oracle is an independent CASE — it states the expected
    //      route per key family directly instead of re-running the regex
    //      chain, so a routing bug cannot cancel out. ----
    "q28_route_keys" -> QueryDef(
      (s, dir) => {
        val key = when(col("event_type") === "click",
            concat(lit("tag:"), col("user_id"), lit(":topics")))
          .when(col("event_type") === "signup",
            concat(lit("user:"), col("user_id")))
          .when(col("event_type") === "error",
            concat(lit("ip:10.0.0."), col("user_id"), lit(":uid")))
          .when(col("event_type") === "view",
            concat(lit("settings:page:"), col("user_id")))
          .otherwise(concat(lit("group:cid:"), col("user_id"),
            lit(":privileges:read")))
        Tables.load(s, dir, "events")
          // materialize the key first: routeTableCol references its input
          // many times, and inlining a composite expression at every
          // reference would blow up the plan tree
          .select(key.as("_key"))
          .select(Route.routeTableCol(col("_key"), "events").as("dest_table"))
          .groupBy(col("dest_table"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("dest_table"))
      },
      Some("""SELECT CASE event_type
                 WHEN 'click'    THEN 'tag_topics'
                 WHEN 'signup'   THEN 'user'
                 WHEN 'error'    THEN 'ip_uid'
                 WHEN 'view'     THEN 'settings'
                 ELSE 'group_privileges'
               END AS dest_table,
               count(*) AS n_rows
             FROM events
             GROUP BY dest_table
             ORDER BY dest_table""")),

    // ---- schema flattening (Porter.php:277-298): build a nested document
    //      column, run it through FlattenDF, expect underscore paths. The
    //      oracle projects the same leaf values directly. ----
    "q29_flatten_nested" -> QueryDef(
      (s, dir) => {
        val nested = Tables.load(s, dir, "events")
          .select(col("event_id"),
            struct(
              struct(col("value").as("lat"),
                (col("value") * 2).as("lon")).as("geo"),
              col("event_type").as("name")).as("payload"))
        val (flat, children) = FlattenDF.flatten(nested)
        require(children.isEmpty, "no child-bearing fields expected here")
        flat.orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
               value AS payload_geo_lat,
               value * 2 AS payload_geo_lon,
               event_type AS payload_name
             FROM events
             ORDER BY event_id""")),

    // ---- distributed type inference (Porter.php:358-429 as one agg pass)
    //      over the documents table. The oracle recomputes the expected
    //      type from max(length) + the bucketing thresholds — an
    //      independent statement of guessDbType ⊔ widen for columns whose
    //      values are all plain strings or integers. ----
    "q30_infer_documents" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val types = SchemaInfer.inferTypes(Tables.load(s, dir, "documents"))
        types.map { case (c, t) => (c, t.render) }
          .toDF("column_name", "db_type")
          .orderBy(col("column_name"))
      },
      Some("""SELECT column_name,
               CASE WHEN mx > 512 THEN 'text'
                    WHEN mx < 50 THEN 'varchar(50)'
                    WHEN mx < 100 THEN 'varchar(100)'
                    WHEN mx < 255 THEN 'varchar(255)'
                    ELSE 'varchar(512)' END AS db_type
             FROM (
               SELECT 'text' AS column_name, max(length(text)) AS mx FROM documents
               UNION ALL
               SELECT 'lang', max(length(lang)) FROM documents
               UNION ALL
               SELECT 'source', max(length(source)) FROM documents
             )
             UNION ALL SELECT 'doc_id', 'int'
             UNION ALL SELECT 'n_chars', 'int'
             ORDER BY column_name""")),
  )
}

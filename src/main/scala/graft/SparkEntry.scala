package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator (SURVEY.md §2);
  * each SQL-expressible one has a DuckDB oracle in `oracleSql` over the
  * same parquet tables in `sfDir`. Outputs avoid raw doubles (driver
  * hash-compares values) — aggregates are integers or explicitly rounded.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full pipeline core over synthesized sequences:
    * parse → rules filter → route → per-sink counts. */
  def entry(spark: SparkSession): DataFrame = {
    val seqs = DataGen.sequences(spark, 10000L)
    Pipeline.routedRecords(seqs, DataGen.routingRules)
      .groupBy("content_type").agg(count(lit(1)).as("routed_rows"))
      .orderBy("content_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A: aggregations (SURVEY §2.4) -------------------------------
    "q_agg_group" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          count_distinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_route_count" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    "q_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // ---- P/F: filters + scalar functions (SURVEY §2.2, §2.7) ---------
    "q_filter_absent_key_passes" -> ((s, d) => {
      // P1 semantics: rows where key is NULL pass; non-null must equal value.
      val ev = t(s, d, "events")
      val policy = get_json_object(col("props"), "$.plan")
      ev.withColumn("plan", policy)
        .filter(col("plan").isNull || col("plan") === "premium")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    "q_proj_string_funcs" -> ((s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          translate(col("lang"), ".", "_").as("log_type"),
          lower(col("source")).as("src_lower"),
          length(col("text")).as("text_len"),
          substring(col("text"), 1, 8).as("prefix"))
        .orderBy("doc_id")),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          (unix_timestamp(col("ts")) % 86400).as("sec_of_day"))
        .orderBy("event_id")),

    "q_window_split_24h" -> ((s, d) =>
      // ST3: assign events to 24h tumbling windows, count per window
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("window_start"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("window_start")),

    // ---- J: joins (SURVEY §2.3) ---------------------------------------
    "q_join_broadcast_enrich" -> ((s, d) => {
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("cnt"))
        .orderBy("r_name")
    }),

    "q_join_anti_dedup" -> ((s, d) => {
      // J1: customers with no orders (left anti ≡ the known-content dedup)
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),

    "q_join_outer" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment")
    }),

    // ---- O: sorts / limits / set ops (SURVEY §2.6) ---------------------
    "q_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey")),

    "q_union_schema" -> ((s, d) => {
      // O4/P6: union-schema with missing-column padding ("")
      val a = t(s, d, "customer").select(col("c_name").as("name"), col("c_mktsegment").as("seg"))
      val b = t(s, d, "supplier").select(col("s_name").as("name"))
        .withColumn("seg", lit(null: String))
      a.unionByName(b).na.fill("").groupBy("seg").agg(count(lit(1)).as("cnt")).orderBy("seg")
    }),

    "q_duplicate_explode" -> ((s, d) =>
      // O6: row multiplier via explode(array_repeat(...))
      t(s, d, "region")
        .withColumn("i", explode(array_repeat(lit(1), 3)))
        .groupBy("r_name").agg(count(lit(1)).as("cnt"))
        .orderBy("r_name")),

    "q_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // ---- W: window functions (SURVEY §2.5) -----------------------------
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    }),

    // ---- checksum (SURVEY §2.4 A9) — arithmetic so DuckDB agrees --------
    "q_checksum_orderless" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(expr("bit_xor(event_id * 2654435761 + user_id)").as("checksum"))
        .orderBy("event_type"))
  )

  /** DuckDB-runnable oracles; table names resolve to the same parquet. */
  def oracleSql: Map[String, String] = Map(
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS cnt,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q_route_count" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    "q_filter_absent_key_passes" ->
      """SELECT event_type, count(*) AS cnt FROM (
           SELECT event_type, json_extract_string(props, '$.plan') AS plan FROM events
         ) WHERE plan IS NULL OR plan = 'premium'
         GROUP BY 1 ORDER BY 1""",
    "q_proj_string_funcs" ->
      """SELECT doc_id, replace(lang, '.', '_') AS log_type,
         lower(source) AS src_lower,
         length(text) AS text_len, substring(text, 1, 8) AS prefix
         FROM documents ORDER BY doc_id""",
    "q_date_funcs" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS sec_of_day
         FROM events ORDER BY event_id""",
    "q_window_split_24h" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
         count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""",
    "q_join_broadcast_enrich" ->
      """SELECT r_name, count(*) AS cnt FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_anti_dedup" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "q_join_outer" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_union_schema" ->
      """SELECT seg, count(*) AS cnt FROM (
           SELECT c_name AS name, c_mktsegment AS seg FROM customer
           UNION ALL
           SELECT s_name AS name, '' AS seg FROM supplier
         ) GROUP BY 1 ORDER BY 1""",
    "q_duplicate_explode" ->
      """SELECT r_name, count(*) AS cnt FROM region
         CROSS JOIN (SELECT unnest(range(3))) AS g
         GROUP BY 1 ORDER BY 1""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders
         ) WHERE rn = 1 ORDER BY o_custkey""",
    "q_checksum_orderless" ->
      """SELECT event_type,
         bit_xor(event_id * 2654435761 + user_id) AS checksum
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}

package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.GraftSql

/** SQL front-end coverage: the reference's dialect driven end-to-end as
  * SQL text through GraftSql (SURVEY.md §7.4) — COPY INTO with inline-cast
  * subquery, MERGE INTO with dedup subquery, `col:path::type` JSON paths,
  * OPTIMIZE/DESCRIBE HISTORY/RESTORE, time travel.
  */
object SqlQueries extends QueryBatch {

  private def mk(s: SparkSession, tag: String): GraftSql = {
    val p = Paths.get(Scratch.dir(tag))
    Files.createDirectories(p)
    new GraftSql(s, p.toString)
  }

  /** The Step-1 EDW chain as pure SQL: COPY INTO (cast subquery) →
    * empty-clone → MERGE with window-dedup source → JSON-path gold query
    * (`DP/Step 1:125-231`, `DP/Step 5:197-275`). */
  private val q100 = GQ(
    "q100_sql_edw_chain",
    (s, dir) => {
      val g = mk(s, "edw")
      g.createTable("bronze_events", graft.Tables.t(s, dir, "events").schema)
      // match the raw file's ts physical type (Tables.t normalizes reads,
      // but COPY INTO's subquery scans the file directly)
      val tsExpr = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => "timestamp_micros(ts div 1000)"
        case org.apache.spark.sql.types.TimestampNTZType => "CAST(ts AS TIMESTAMP)"
        case _ => "ts"
      }
      g.sql(s"""COPY INTO bronze_events FROM (
                  SELECT event_id, $tsExpr AS ts, user_id,
                         event_type, value, props
                  FROM '$dir/events.parquet') FILEFORMAT = PARQUET""")
      g.sql("CREATE TABLE silver_events AS SELECT * FROM bronze_events WHERE 1 = 0")
      g.sql("""MERGE INTO silver_events AS t
               USING (SELECT event_id, ts, user_id, event_type, value, props FROM (
                        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                                     ORDER BY ts DESC, event_id DESC) AS rn
                        FROM bronze_events) d WHERE rn = 1) AS s
               ON t.user_id = s.user_id AND t.event_type = s.event_type
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      g.sql("""SELECT event_type, sum(props:k::int) AS sum_k, count(*) AS n
               FROM silver_events GROUP BY event_type ORDER BY event_type""")
    },
    Some("""SELECT event_type,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
            count(*) AS n
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) d
            WHERE rn = 1 GROUP BY event_type ORDER BY event_type""")
  )

  /** Idempotent COPY INTO + history + time travel as SQL. */
  private val q101 = GQ(
    "q101_sql_copy_history",
    (s, dir) => {
      val g = mk(s, "hist")
      g.createTable("li", graft.Tables.t(s, dir, "lineitem").schema)
      g.sql(s"COPY INTO li FROM '$dir/lineitem.parquet' FILEFORMAT = PARQUET")
      g.sql(s"COPY INTO li FROM '$dir/lineitem.parquet' FILEFORMAT = PARQUET") // no-op
      g.sql("""SELECT count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty FROM li""")
    },
    Some("""SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty FROM lineitem""")
  )

  /** DELETE / UPDATE / OPTIMIZE ZORDER / RESTORE as SQL statements;
    * time travel reads the pre-delete snapshot. */
  private val q102 = GQ(
    "q102_sql_dml_restore",
    (s, dir) => {
      val g = mk(s, "dml")
      g.createTable("p", graft.Tables.t(s, dir, "part").schema)
      g.sql(s"COPY INTO p FROM '$dir/part.parquet' FILEFORMAT = PARQUET") // v1
      g.sql("DELETE FROM p WHERE p_size < 10")                           // v2
      g.sql("UPDATE p SET p_retailprice = p_retailprice * 2 WHERE p_size >= 45") // v3
      g.sql("OPTIMIZE p ZORDER BY (p_partkey)")                          // v4
      g.sql("RESTORE TABLE p TO VERSION AS OF 1")                        // back to full
      g.sql("SELECT p_partkey, p_size, p_retailprice FROM p ORDER BY p_partkey")
    },
    Some("""SELECT p_partkey, p_size, p_retailprice FROM part ORDER BY p_partkey""")
  )

  /** Time-travel SELECT syntax: `FROM t VERSION AS OF n`. */
  private val q103 = GQ(
    "q103_sql_time_travel",
    (s, dir) => {
      val g = mk(s, "tt")
      g.createTable("o", graft.Tables.t(s, dir, "orders").schema)
      g.sql(s"COPY INTO o FROM '$dir/orders.parquet' FILEFORMAT = PARQUET") // v1
      g.sql("DELETE FROM o WHERE o_orderstatus = 'O'")                      // v2
      g.sql("""SELECT o_orderkey, o_orderstatus FROM o VERSION AS OF 1
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey""")
  )

  /** Timestamp-based time travel: `FROM t TIMESTAMP AS OF 'ts'` resolves
    * the snapshot current at the wall-clock instant through the
    * monotonized commit-timestamp index, flooring between commits
    * (Delta semantics). The probe timestamp is captured between the COPY
    * and the DELETE, so the travel read must recover the pre-delete
    * snapshot. RESTORE TO TIMESTAMP rides the same resolver
    * (GraftSqlSpec pins it). */
  private val q236 = GQ(
    "q236_sql_timestamp_travel",
    (s, dir) => {
      val g = mk(s, "tstravel")
      g.createTable("o", graft.Tables.t(s, dir, "orders").schema)
      g.sql(s"COPY INTO o FROM '$dir/orders.parquet' FILEFORMAT = PARQUET") // v1
      Thread.sleep(5)
      val ts1 = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(5)
      g.sql("DELETE FROM o WHERE o_orderstatus = 'O'") // v2, after ts1
      g.sql(s"""SELECT o_orderkey, o_orderstatus FROM o TIMESTAMP AS OF '$ts1'
               ORDER BY o_orderkey""")
    },
    Some("SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey")
  )

  override def queries: Seq[GQ] = Seq(q100, q101, q102, q103, q236)
}

package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.services.{DataValidator, DeltaLogger, Transaction}
import graft.sql.GraftSql

/** Engine services coverage (SURVEY.md §7 module 7): hash-diff validation,
  * run logging, RESTORE-based multi-statement transactions.
  */
object ServiceQueries extends QueryBatch {

  private def scratch(tag: String): String = {
    val p = Paths.get("/root/repo/target/qtmp",
      tag + "-" + java.util.UUID.randomUUID().toString.take(8))
    Files.createDirectories(p)
    p.toString
  }

  /** DataValidator hash-diff: counts + percent match between a table and a
    * perturbed copy (`HF/datavalidator.py:121-254`). */
  private val q110 = GQ(
    "q110_validator_diff",
    (s, dir) => {
      val a = Tables.t(s, dir, "customer")
      val b = a.withColumn("c_acctbal",
        when(col("c_custkey") % 4 === 0, col("c_acctbal") + 1).otherwise(col("c_acctbal")))
      DataValidator.reportDF(a, b)
    },
    Some("""SELECT
            (SELECT count(*) FROM customer) AS rows_a,
            (SELECT count(*) FROM customer) AS rows_b,
            (SELECT count(*) FROM customer WHERE c_custkey % 4 <> 0) AS matched,
            (SELECT count(*) FROM customer WHERE c_custkey % 4 = 0) AS only_in_a,
            (SELECT count(*) FROM customer WHERE c_custkey % 4 = 0) AS only_in_b,
            round((SELECT count(*) FROM customer WHERE c_custkey % 4 <> 0)::DOUBLE
                  * 100.0 / (SELECT count(*) FROM customer) + 1e-9, 2) AS pct_match""")
  )

  /** DeltaLogger run tracking: identity run ids, status, metrics
    * (`HF/deltalogger.py:167-446`). */
  private val q111 = GQ(
    "q111_run_logger",
    (s, dir) => {
      val lg = new DeltaLogger(s, scratch("runs"), "nightly_etl")
      lg.startRun(Map("sf" -> dir))
      lg.logMetric("rows_processed", 1000.0)
      lg.endRun("SUCCESS")
      lg.startRun()
      lg.failRun("boom")
      lg.runs.select(col("run_id"), col("process_name"), col("status"),
          col("run_metrics").getItem("rows_processed").as("rows_processed"))
        .orderBy("run_id")
    },
    Some("""SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), 'nightly_etl', 'SUCCESS', 1000.0),
              (CAST(2 AS BIGINT), 'nightly_etl', 'FAILED', NULL)
            ) r(run_id, process_name, status, rows_processed) ORDER BY run_id""")
  )

  /** Transaction rollback: a failing statement chain restores every
    * touched table to its pre-transaction version
    * (`HF/transactions.py:304-540`). */
  private val q112 = GQ(
    "q112_transaction_rollback",
    (s, dir) => {
      val g = new GraftSql(s, scratch("txn"))
      g.createTable("p", Tables.t(s, dir, "part").schema)
      g.sql(s"COPY INTO p FROM '$dir/part.parquet' FILEFORMAT = PARQUET")
      val txn = new Transaction(g)
      try txn.executeSqlTransaction(
        """DELETE FROM p WHERE p_size < 25;
           UPDATE p SET p_retailprice = 0 WHERE p_size >= 25;
           SELECT * FROM no_such_table""")
      catch { case _: Transaction.RolledBackException => () }
      g.sql("SELECT p_partkey, p_size, p_retailprice FROM p ORDER BY p_partkey")
    },
    Some("""SELECT p_partkey, p_size, p_retailprice FROM part ORDER BY p_partkey""")
  )

  override def queries: Seq[GQ] = Seq(q110, q111, q112)
}

package graft.sql

import graft.{SparkTestBase, Tables}

class GraftSqlSpec extends SparkTestBase {

  test("JSON path rewrite: cast, no-cast, nested, quote-protected") {
    assert(JsonPathRewrite("SELECT props:k::int FROM t") ===
      "SELECT CAST(get_json_object(props, '$.k') AS int) FROM t")
    assert(JsonPathRewrite("SELECT details:flow.output FROM t") ===
      "SELECT get_json_object(details, '$.flow.output') FROM t")
    // `::` casts without a json path are untouched
    assert(JsonPathRewrite("SELECT id::bigint FROM t") === "SELECT id::bigint FROM t")
    // colons inside string literals are untouched
    assert(JsonPathRewrite("SELECT 'a:b' FROM t") === "SELECT 'a:b' FROM t")
  }

  test("merge parser handles nested parens and aliases") {
    val g = new GraftSql(spark, scratch("sqlspec"))
    g.createTable("tgt", Tables.t(spark, sf, "customer").schema)
    g.sql(s"COPY INTO tgt FROM '$sf/customer.parquet' FILEFORMAT = PARQUET")
    // USING subquery with window (3 paren levels) + UPDATE SET expr
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT * FROM (
                      SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                                   ORDER BY c_acctbal DESC) AS rn
                      FROM tgt) x WHERE rn = 1) AS s
             ON t.c_custkey = s.c_custkey
             WHEN MATCHED THEN UPDATE SET c_mktsegment = 'TOP'""")
    val tops = g.table("tgt").read()
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "TOP").count()
    assert(tops === 25) // one per nation
  }

  test("QUALIFY: plain, with CTE, with ORDER BY/LIMIT, DISTINCT, comments") {
    val g = new GraftSql(spark, scratch("qualify"))
    g.createTable("nat", Tables.t(spark, sf, "nation").schema)
    g.sql(s"COPY INTO nat FROM '$sf/nation.parquet' FILEFORMAT = PARQUET")

    // plain: first nation per region == the subquery formulation
    val plain = g.sql(
      """SELECT n_nationkey FROM nat
         QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1""")
      .collect().map(_.getInt(0)).toSet
    val expected = g.sql(
      """SELECT n_nationkey FROM (
           SELECT n_nationkey, row_number() OVER (PARTITION BY n_regionkey
             ORDER BY n_nationkey) AS rn FROM nat) WHERE rn = 1""")
      .collect().map(_.getInt(0)).toSet
    assert(plain === expected && plain.size === 5)

    // CTE before the QUALIFY block
    val cte = g.sql(
      """WITH x AS (SELECT n_nationkey, n_regionkey FROM nat)
         SELECT n_nationkey FROM x
         QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1""")
      .collect().map(_.getInt(0)).toSet
    assert(cte === expected)

    // trailing ORDER BY / LIMIT survive outside the wrapper
    val top3 = g.sql(
      """SELECT n_nationkey FROM nat
         QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1
         ORDER BY n_nationkey DESC LIMIT 3""")
      .collect().map(_.getInt(0)).toSeq
    assert(top3 === expected.toSeq.sorted.reverse.take(3))

    // SELECT DISTINCT: QUALIFY filters pre-distinct rows, DISTINCT applies
    // to the filtered projection (not widened by the helper column)
    val dq = g.sql(
      """SELECT DISTINCT n_regionkey FROM nat
         QUALIFY row_number() OVER (ORDER BY n_nationkey) <= 7""")
      .collect().map(_.getInt(0)).toSet
    val dExpected = g.sql(
      """SELECT DISTINCT n_regionkey FROM (
           SELECT n_regionkey, row_number() OVER (ORDER BY n_nationkey) AS rn
           FROM nat) WHERE rn <= 7""")
      .collect().map(_.getInt(0)).toSet
    assert(dq === dExpected)

    // the word QUALIFY in comments or string literals must not trigger
    assert(g.sql(
      "SELECT n_nationkey FROM nat -- QUALIFY pending review\nORDER BY n_nationkey LIMIT 2")
      .count() === 2)
    assert(g.sql(
      "SELECT n_nationkey FROM nat /* no QUALIFY here */ ORDER BY n_nationkey LIMIT 2")
      .count() === 2)
    assert(g.sql("SELECT 'about QUALIFY' AS note FROM nat LIMIT 1")
      .head().getString(0) === "about QUALIFY")
  }

  test("unknown table and unparsable statements raise errors") {
    val g = new GraftSql(spark, scratch("sqlerr"))
    intercept[RuntimeException] { g.sql("OPTIMIZE nope") }
    intercept[RuntimeException] { g.sql("MERGE INTO x USING y") } // no ON
  }

  test("OPTIMIZE WHERE routes the predicate scope; INCREMENTAL combination rejected") {
    import org.apache.spark.sql.functions._
    val g = new GraftSql(spark, scratch("optwheresql"))
    val o = Tables.t(spark, sf, "orders")
    val cut = o.agg(max("o_orderkey")).head().getLong(0) / 2
    g.createTable("ow", o.schema)
    val t = g.table("ow")
    t.append(o.filter(col("o_orderkey") <= cut).repartition(3))
    t.append(o.filter(col("o_orderkey") > cut).coalesce(1))
    val high = t.pruneFiles(s"o_orderkey > $cut")._1.toSet
    val r = g.sql(s"OPTIMIZE ow WHERE o_orderkey <= $cut ZORDER BY (o_orderkey)")
      .head()
    assert(r.getLong(2) === 3, "numFilesRemoved must be the 3 in-scope files")
    assert(high.subsetOf(t.filesAt().toSet))
    assert(t.commits.last.operationParameters("predicate") === s"o_orderkey <= $cut")
    intercept[RuntimeException] {
      g.sql(s"OPTIMIZE ow WHERE o_orderkey <= $cut INCREMENTAL")
    }
  }

  test("GRANT/REVOKE are accepted as no-ops") {
    val g = new GraftSql(spark, scratch("acl"))
    assert(g.sql("GRANT SELECT ON TABLE x TO `analysts`").count() === 0)
  }

  test("streaming table refresh re-runs the stored definition") {
    val g = new GraftSql(spark, scratch("st"))
    g.createTable("base", Tables.t(spark, sf, "region").schema)
    g.sql(s"COPY INTO base FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    g.sql("CREATE OR REFRESH STREAMING TABLE st AS SELECT r_regionkey FROM base")
    assert(g.table("st").read().count() === 5)
    g.sql("DELETE FROM base WHERE r_regionkey >= 2")
    g.sql("CREATE OR REFRESH STREAMING TABLE st AS SELECT r_regionkey FROM base")
    assert(g.table("st").read().count() === 2)
  }

  test("bloomfilter index statement sets the write property") {
    val g = new GraftSql(spark, scratch("bf"))
    g.createTable("t", Tables.t(spark, sf, "part").schema)
    g.sql("CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS(p_partkey, p_brand)")
    assert(g.table("t").properties("graft.bloomFilterColumns") === "p_partkey,p_brand")
  }

  test("cloud_files / read_files TVFs resolve to file reads in SQL") {
    val g = new GraftSql(spark, scratch("tvf"))
    val n1 = g.sql(s"SELECT count(*) AS n FROM cloud_files('$sf/region.parquet', 'parquet')")
      .head().getLong(0)
    assert(n1 === 5)
    val n2 = g.sql(s"SELECT count(*) AS n FROM read_files('$sf/nation.parquet', format => 'parquet')")
      .head().getLong(0)
    assert(n2 === 25)
  }

  test("Sources.fromRows rehydrates client-fetched records; remote compare diffs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val local = graft.sources.Sources.fromRows(spark, Seq(Row(1, "a"), Row(2, "b")), schema)
    val remote = graft.sources.Sources.fromRows(spark, Seq(Row(1, "a"), Row(2, "x")), schema)
    val rep = graft.sources.Sources.compareWithRemote(local, remote)
    assert(rep.matched === 1 && rep.onlyInA === 1 && rep.onlyInB === 1)
  }

  test("table_changes TVF reads the change feed in SQL") {
    val g = new GraftSql(spark, scratch("tc"))
    g.createTable("t", Tables.t(spark, sf, "region").schema,
      Map("graft.enableChangeDataFeed" -> "true"))
    g.sql(s"COPY INTO t FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    g.sql("DELETE FROM t WHERE r_regionkey = 0")
    val n = g.sql(
      "SELECT count(*) AS n FROM table_changes('t', 2) WHERE _change_type = 'delete'")
      .head().getLong(0)
    assert(n === 1)
  }

  test("sqlChain runs statements in order and returns the last result") {
    val g = new GraftSql(spark, scratch("chain"))
    g.createTable("t1", Tables.t(spark, sf, "region").schema)
    val out = g.sqlChain(s"""
      COPY INTO t1 FROM '$sf/region.parquet' FILEFORMAT = PARQUET;
      DELETE FROM t1 WHERE r_regionkey >= 3;
      SELECT count(*) AS n FROM t1""")
    assert(out.head().getLong(0) === 3)
  }

  test("statement splitting and rewrites are quote-aware") {
    assert(SqlText.splitStatements("SELECT 'a;b' AS x; SELECT 2") ===
      Seq("SELECT 'a;b' AS x", "SELECT 2"))
    val g = new GraftSql(spark, scratch("quotes"))
    g.createTable("qt", Tables.t(spark, sf, "region").schema)
    g.sql(s"COPY INTO qt FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    // ';' inside a literal must not split; literal mentioning VERSION AS OF
    // and an unregistered identifier must pass through untouched
    val out = g.sqlChain(
      "SELECT 'qt VERSION AS OF 9; still one literal' AS s, count(*) AS n FROM qt")
    val row = out.head()
    assert(row.getString(0) === "qt VERSION AS OF 9; still one literal")
    assert(row.getLong(1) === 5)
    // real time travel still rewrites
    assert(g.sql("SELECT count(*) AS n FROM qt VERSION AS OF 0").head().getLong(0) === 0)
  }

  test("backslash-escaped quotes do not desync splitting or rewrites") {
    // \' inside a literal must not toggle the in-quote state: the ';' and
    // the second statement stay intact
    assert(SqlText.splitStatements("""SELECT 'it\'s; done' AS x; SELECT 2""") ===
      Seq("""SELECT 'it\'s; done' AS x""", "SELECT 2"))
    // doubled '' still works (scanner sees two adjacent literals)
    assert(SqlText.splitStatements("SELECT 'a''b;c' AS x; SELECT 2") ===
      Seq("SELECT 'a''b;c' AS x", "SELECT 2"))
    // escaped backslash before the closing quote: 'a\\' ends the literal
    assert(SqlText.splitStatements("""SELECT 'a\\'; SELECT 2""") ===
      Seq("""SELECT 'a\\'""", "SELECT 2"))
    // mapOutsideLiterals must not rewrite inside the \'-carrying literal
    val mapped = SqlText.mapOutsideLiterals("""X 'it\'s X' X""")(_.replace("X", "Y"))
    assert(mapped === """Y 'it\'s X' Y""")
  }

  test("CLUSTER BY DDL drives bare OPTIMIZE's layout") {
    val g = new GraftSql(spark, scratch("cluster"))
    g.sqlChain(s"""
      CREATE TABLE ct CLUSTER BY (c_custkey) AS
        SELECT * FROM parquet.`$sf/customer.parquet`;
      OPTIMIZE ct""")
    val t = g.table("ct")
    assert(t.properties("graft.clusterBy") === "c_custkey")
    val opt = t.commits.filter(_.operation == "OPTIMIZE").last
    assert(opt.operationParameters("zOrderBy") === "c_custkey")
    // re-key via ALTER; NONE clears
    g.sql("ALTER TABLE ct CLUSTER BY (c_nationkey, c_custkey)")
    assert(g.table("ct").properties("graft.clusterBy") === "c_nationkey,c_custkey")
    g.sql("ALTER TABLE ct CLUSTER BY NONE")
    assert(g.table("ct").properties("graft.clusterBy") === "")
  }

  test("VACUUM defaults to a safe retention and requires FORCE for zero") {
    val g = new GraftSql(spark, scratch("vac"))
    g.createTable("vt", Tables.t(spark, sf, "region").schema)
    g.sql(s"COPY INTO vt FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    g.sql("DELETE FROM vt WHERE r_regionkey = 0") // v2 rewrites a file
    // default VACUUM: 7-day window keeps everything committed just now
    assert(g.sql("VACUUM vt").head().getLong(0) === 0L)
    assert(g.sql("SELECT count(*) FROM vt VERSION AS OF 1").head().getLong(0) === 5)
    intercept[RuntimeException](g.sql("VACUUM vt RETAIN 0 VERSIONS"))
    // explicit FORCE destroys history
    assert(g.sql("VACUUM vt RETAIN 0 VERSIONS FORCE").head().getLong(0) > 0L)
  }

  test("TIMESTAMP AS OF floors between commits; RESTORE TO TIMESTAMP repoints") {
    val g = new GraftSql(spark, scratch("tstt"))
    g.createTable("tt", Tables.t(spark, sf, "customer").schema)
    g.sql(s"COPY INTO tt FROM '$sf/customer.parquet' FILEFORMAT = PARQUET") // v1
    val n1 = g.table("tt").read().count()
    Thread.sleep(5)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    g.sql("DELETE FROM tt WHERE c_custkey % 2 = 0") // v2
    val n2 = g.table("tt").read().count()
    assert(n2 < n1)
    assert(g.sql(s"SELECT count(*) FROM tt TIMESTAMP AS OF '$mid'")
      .head().getLong(0) === n1)
    // a future timestamp resolves to the latest snapshot
    assert(g.sql("SELECT count(*) FROM tt TIMESTAMP AS OF '2099-01-01'")
      .head().getLong(0) === n2)
    // one before the first commit is an error, not an empty read
    intercept[Exception](
      g.sql("SELECT count(*) FROM tt TIMESTAMP AS OF '1990-01-01'"))
    // RESTORE TO TIMESTAMP rides the same resolver
    assert(g.sql(s"RESTORE TABLE tt TO TIMESTAMP AS OF '$mid'")
      .head().getLong(0) === 1L)
    assert(g.table("tt").read().count() === n1)
  }

  test("TIMESTAMP AS OF inside a string literal is data, not a rewrite") {
    val g = new GraftSql(spark, scratch("tslit"))
    import spark.implicits._
    g.createTable("o", Seq((1L, "x")).toDF("id", "v").schema)
    g.table("o").append(Seq((1L, "x"), (2L, "o TIMESTAMP AS OF ")).toDF("id", "v"))
    // a regex over the full text would match ACROSS the two literals
    // here (capturing " AND id = " as the timestamp operand) and throw
    val n = g.sql(
      "SELECT count(*) FROM o WHERE v = 'o TIMESTAMP AS OF ' AND id = 2")
      .head().getLong(0)
    assert(n === 1L)
    // and the real rewrite still fires right next to a literal predicate
    val all = g.sql(
      "SELECT count(*) FROM o TIMESTAMP AS OF '2099-01-01' WHERE v <> 'nope'")
      .head().getLong(0)
    assert(all === 2L)
  }
}

package graft.sql

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.tables.GraftTable

/** Fuzz pins for the regex/scan statement router: adversarial SQL
  * literals — clause keywords, separators, quotes, unbalanced parens —
  * pushed through the UPDATE / MERGE / DELETE / COPY INTO / DDL paths.
  * Contract: every statement either parses CORRECTLY (the literal
  * round-trips byte-for-byte, clause boundaries unmoved) or is rejected
  * LOUDLY; a keyword inside a string literal must never silently move a
  * clause boundary (the classic regex-router trap — `splitTopLevel`,
  * `indexOfTopLevel`, and the top-level WHEN-clause splitter are the
  * mechanisms under test).
  */
class GraftSqlFuzzSpec extends SparkTestBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(77L)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  /** SQL-escape for a single-quoted literal (doubled-quote form — the
    * escape both Spark and the router's quote-parity scanners honor). */
  private def esc(p: String): String = p.replace("'", "''")

  // clause keywords, separators, quote games — no backslashes (Spark's
  // backslash-escape handling is pinned by its own GraftSqlSpec test).
  // Comment markers and backtick identifiers ride INSIDE literals here:
  // the comment stripper and keyword scanners must treat them as payload
  // (a '--' in a literal is not a comment; a '`' in a literal opens no
  // identifier)
  private val fragments = Seq(
    "WHEN MATCHED", "WHEN NOT MATCHED", "THEN DELETE", "THEN UPDATE SET",
    " USING ", " ON ", " WHERE ", " THEN ", "VALUES (1,2)", "INSERT *",
    "a,b", "k=v", "it's", "two''quotes", "(", ")", "((", "))", ";",
    "; DROP TABLE tgt", "SELECT * FROM t", "::int", "props:k",
    "TIMESTAMP AS OF", "OPTIMIZE ZORDER BY", "MERGE INTO x",
    "-- not a comment", "/* not, a block */", "*/", "`weird id`",
    "` WHERE `", "CASE WHEN a THEN b END")
  private val payloadGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    parts <- Gen.listOfN(n, Gen.oneOf(fragments))
    pad <- Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString)
  } yield (parts :+ pad).mkString(" ")

  private def freshSql(tag: String): GraftSql = {
    import spark.implicits._
    val g = new GraftSql(spark, scratch(tag))
    val t = GraftTable.createFrom(spark, scratch(tag) + "/tgt",
      Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
        .toDF("id", "v", "n"))
    g.register("tgt", t)
    g
  }

  test("UPDATE round-trips adversarial literals exactly") {
    val g = freshSql("fuzzupd")
    samples(payloadGen, 12).foreach { p =>
      g.sql(s"UPDATE tgt SET v = '${esc(p)}' WHERE id = 1")
      val got = g.table("tgt").read().filter(col("id") === 1)
        .select("v").head().getString(0)
      assert(got === p, s"UPDATE mangled literal: <$p> -> <$got>")
      // the other rows' values must be untouched (a moved WHERE boundary
      // would update everything or throw)
      assert(g.table("tgt").read().filter(col("id") === 2)
        .select("v").head().getString(0) === "two")
    }
  }

  test("MERGE: adversarial literal in source value round-trips") {
    val g = freshSql("fuzzmrg")
    samples(payloadGen, 8).foreach { p =>
      g.sql(s"""MERGE INTO tgt AS t
                USING (SELECT 2 AS id, '${esc(p)}' AS nv) AS s
                ON t.id = s.id
                WHEN MATCHED THEN UPDATE SET v = s.nv
                WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.nv, 0)""")
      val got = g.table("tgt").read().filter(col("id") === 2)
        .select("v").head().getString(0)
      assert(got === p, s"MERGE mangled literal: <$p> -> <$got>")
    }
  }

  test("MERGE: clause keywords inside ON / AND literals move no boundary") {
    val g = freshSql("fuzzon")
    // ON-condition literal contains every clause keyword the scanner
    // hunts for; the statement must still parse as ONE matched clause
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 1 AS id) AS s
             ON t.id = s.id AND t.v <> 'x USING y ON z WHEN MATCHED THEN DELETE'
             WHEN MATCHED THEN UPDATE SET v = 'hit'""")
    assert(g.table("tgt").read().filter(col("v") === "hit").count() === 1)
    // matched-condition literal with THEN + WHEN NOT MATCHED inside it
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 2 AS id, 'nv2' AS nv) AS s
             ON t.id = s.id
             WHEN MATCHED AND t.v <> 'a THEN b WHEN NOT MATCHED THEN INSERT *'
               THEN UPDATE SET v = s.nv
             WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.nv, 0)""")
    assert(g.table("tgt").read().filter(col("id") === 2)
      .select("v").head().getString(0) === "nv2")
    // UPDATE SET value with a comma, a paren, and a CASE WHEN — the
    // top-level comma split and clause split must both hold
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 3 AS id) AS s
             ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET
               v = concat('a,b(', CASE WHEN 1 = 1 THEN 'c' ELSE 'd' END),
               n = t.n + 1""")
    val r3 = g.table("tgt").read().filter(col("id") === 3).head()
    assert(r3.getAs[String]("v") === "a,b(c" && r3.getAs[Long]("n") === 31L)
  }

  test("DELETE with keyword-literal predicate deletes exactly the match") {
    val g = freshSql("fuzzdel")
    samples(payloadGen, 6).foreach { p =>
      g.sql(s"UPDATE tgt SET v = '${esc(p)}' WHERE id = 3")
      val before = g.table("tgt").read().count()
      g.sql(s"DELETE FROM tgt WHERE v = '${esc(p)}'")
      assert(g.table("tgt").read().count() === before - 1,
        s"DELETE removed the wrong rows for literal <$p>")
      g.sql("""MERGE INTO tgt USING (SELECT 3 AS id, 'three' AS v, 30 AS n) s
               ON tgt.id = s.id
               WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)""")
    }
  }

  test("newline/tab-separated clauses parse like their one-line forms") {
    // the keyword scanner must accept any whitespace at clause
    // boundaries (review finding: single-space tokens rejected
    // 'SET v = 1\nWHERE id = 2')
    val g = freshSql("fuzzws")
    g.sql("UPDATE tgt SET v = 'nl'\nWHERE id = 2")
    assert(g.table("tgt").read().filter(col("v") === "nl").count() === 1)
    g.sql("UPDATE tgt SET v = 'tab'\twHERE id = 2")
    assert(g.table("tgt").read().filter(col("v") === "tab").count() === 1)
    g.sql("MERGE INTO tgt AS t\nUSING\n(SELECT 1 AS id) AS s\nON t.id = s.id\n" +
      "WHEN MATCHED AND t.n > 0 THEN\nUPDATE SET v = 'ml'\n" +
      "WHEN NOT MATCHED THEN\n\tINSERT (id, v, n) VALUES (s.id, 'x', 0)")
    assert(g.table("tgt").read().filter(col("v") === "ml").count() === 1)
    // keyword as identifier substring must NOT match ("WHEREABOUTS")
    g.sql("UPDATE tgt SET v = 'whereabouts are unknown' WHERE id = 3")
    assert(g.table("tgt").read().filter(col("id") === 3)
      .select("v").head().getString(0) === "whereabouts are unknown")
  }

  test("backslash-escaped quotes and length-changing case do not desync the scanner") {
    val g = freshSql("fuzzesc")
    // backslash-escaped quote inside a literal that ALSO contains WHERE:
    // the scanner must keep quote parity (review finding: the naive
    // toggle treated \' as a close and found the literal's WHERE)
    g.sql("UPDATE tgt SET v = 'it\\'s x WHERE y' WHERE id = 1")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("v").head().getString(0) === "it's x WHERE y")
    assert(g.table("tgt").read().filter(col("v") === "two").count() === 1,
      "rows outside the WHERE must be untouched")
    // length-changing uppercase: 'ß'.toUpperCase = \"SS\" — a scanner
    // working on a toUpperCase COPY desyncs every index after it and
    // loses the real WHERE (silent full-table update)
    g.sql("UPDATE tgt SET v = 'straße' WHERE id = 2")
    assert(g.table("tgt").read().filter(col("v") === "straße").count() === 1)
    assert(g.table("tgt").read().filter(col("id") === 3)
      .select("v").head().getString(0) === "three",
      "a desynced scanner would have updated every row")
    // backslash-escaped quote in a MERGE source literal with clause
    // keywords inside
    g.sql("MERGE INTO tgt AS t USING (SELECT 3 AS id, 'don\\'t WHEN MATCHED THEN' AS nv) AS s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.nv")
    assert(g.table("tgt").read().filter(col("id") === 3)
      .select("v").head().getString(0) === "don't WHEN MATCHED THEN")
  }

  test("sqlChain: ';' and keywords inside literals do not split statements") {
    val g = freshSql("fuzzchain")
    val r = g.sqlChain(
      """UPDATE tgt SET v = 'a; DROP TABLE tgt; MERGE INTO' WHERE id = 1;
         SELECT v FROM (SELECT 'x;y' AS v)""")
    assert(r.head().getString(0) === "x;y")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("v").head().getString(0) === "a; DROP TABLE tgt; MERGE INTO")
  }

  test("TBLPROPERTIES values with commas and '=' survive the kv parser") {
    val g = freshSql("fuzzprops")
    g.sql("ALTER TABLE tgt SET TBLPROPERTIES('a' = 'x,y', 'b' = 'k=v', 'c' = 'plain')")
    val props = g.table("tgt").properties
    assert(props("a") === "x,y" && props("b") === "k=v" && props("c") === "plain")
  }

  test("COPY INTO: PATTERN literal is honored, never routed") {
    val g = freshSql("fuzzcopy")
    import spark.implicits._
    val dir = scratch("fuzzcopy-src")
    Seq((9L, "nine", 90L)).toDF("id", "v", "n").write.parquet(dir + "/p")
    val n = g.sql(s"COPY INTO tgt FROM '$dir/p' FILEFORMAT = PARQUET " +
      "PATTERN = 'no such file *'").head().getLong(0)
    assert(n === 0L, "non-matching PATTERN must ingest nothing")
    val n2 = g.sql(s"COPY INTO tgt FROM '$dir/p' FILEFORMAT = PARQUET " +
      "PATTERN = '*.parquet'").head().getLong(0)
    assert(n2 === 1L)
  }

  test("comments outside literals are stripped; inside literals they are payload") {
    val g = freshSql("fuzzcmt")
    // trailing -- comment carrying a comma and a WHERE: neither may move
    // the assignment split or the predicate boundary
    g.sql("UPDATE tgt SET v = 'c1' -- not a boundary, WHERE id = 3\nWHERE id = 1")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("v").head().getString(0) === "c1")
    assert(g.table("tgt").read().filter(col("id") === 3)
      .select("v").head().getString(0) === "three")
    // block comment with a comma BETWEEN assignments
    g.sql("UPDATE tgt SET v = 'c2', /* skip, these, commas */ n = 99 WHERE id = 2")
    val r2 = g.table("tgt").read().filter(col("id") === 2).head()
    assert(r2.getAs[String]("v") === "c2" && r2.getAs[Long]("n") === 99L)
    // comment markers INSIDE a literal survive byte-for-byte
    g.sql("UPDATE tgt SET v = 'has -- no comment /* nor block */' WHERE id = 1")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("v").head().getString(0) === "has -- no comment /* nor block */")
    // a ';' inside a comment must not split a chain; a comment between
    // MERGE clauses must not hide the clause boundary
    val r = g.sqlChain(
      """MERGE INTO tgt AS t -- merge; with, commentary WHEN MATCHED
         USING (SELECT 9 AS id, 'nine' AS nv) AS s
         ON t.id = s.id /* block; comment THEN DELETE */
         WHEN MATCHED THEN UPDATE SET v = s.nv
         WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.nv, 0);
         SELECT v FROM (SELECT 'x;--y' AS v)""")
    assert(r.head().getString(0) === "x;--y")
    assert(g.table("tgt").read().filter(col("id") === 9)
      .select("v").head().getString(0) === "nine")
  }

  test("backtick identifiers: keywords and commas inside `…` move no boundary") {
    import spark.implicits._
    val g = new GraftSql(spark, scratch("fuzzbt"))
    val t = GraftTable.createFrom(spark, scratch("fuzzbt") + "/tgt",
      Seq((1L, "one", 10L), (2L, "two", 20L))
        .toDF("id", "when matched then", "my where"))
    g.register("tgt", t)
    // backticked column names carrying clause keywords, referenced in SET
    // target, SET value, and WHERE — the scanner must skip `…` content
    g.sql("UPDATE tgt SET `when matched then` = 'hit' WHERE `my where` = 10")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("when matched then").head().getString(0) === "hit")
    assert(g.table("tgt").read().filter(col("id") === 2)
      .select("when matched then").head().getString(0) === "two")
    // MERGE with the keyword-named column in ON, condition, and SET
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 2 AS id, 'mhit' AS nv) AS s
             ON t.id = s.id AND t.`when matched then` <> 'zzz'
             WHEN MATCHED AND t.`my where` > 0 THEN
               UPDATE SET `when matched then` = s.nv
             WHEN NOT MATCHED THEN INSERT (id, `when matched then`, `my where`)
               VALUES (s.id, s.nv, 0)""")
    assert(g.table("tgt").read().filter(col("id") === 2)
      .select("when matched then").head().getString(0) === "mhit")
  }

  test("unparenthesized CASE WHEN … THEN … END in a MERGE condition parses") {
    val g = freshSql("fuzzcase")
    // the CASE's own THEN must not terminate the WHEN clause early
    // (clause-splitter CASE-nesting — review finding)
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 1 AS id, 'chit' AS nv) AS s
             ON t.id = s.id
             WHEN MATCHED AND CASE WHEN t.n > 5 THEN true ELSE false END
               THEN UPDATE SET v = s.nv
             WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.nv, 0)""")
    assert(g.table("tgt").read().filter(col("id") === 1)
      .select("v").head().getString(0) === "chit")
    // CASE in the UPDATE SET value together with a following assignment
    g.sql("""MERGE INTO tgt AS t
             USING (SELECT 2 AS id) AS s
             ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET
               v = CASE WHEN t.n = 20 THEN 'twenty' ELSE 'other' END,
               n = t.n + 2""")
    val r2 = g.table("tgt").read().filter(col("id") === 2).head()
    assert(r2.getAs[String]("v") === "twenty" && r2.getAs[Long]("n") === 22L)
  }

  test("malformed statements are rejected loudly, not silently misrouted") {
    val g = freshSql("fuzzbad")
    val bad = Seq(
      "MERGE INTO tgt USING",                       // truncated
      "MERGE INTO tgt USING (SELECT 1 AS id) s",    // missing ON
      "MERGE INTO tgt USING (SELECT 1 AS id) s ON tgt.id = s.id", // no WHEN
      "MERGE INTO tgt USING (SELECT 1 AS id) s ON tgt.id = s.id " +
        "WHEN MATCHED UPDATE SET v = 'x'",          // missing THEN
      "COPY INTO tgt FROM",                         // truncated
      "RESTORE tgt TO VERSION AS OF abc",           // non-numeric version
      "OPTIMIZE",                                   // no table
      "UPDATE tgt SET",                             // no assignments
      "VACUUM tgt RETAIN 0 VERSIONS")               // zero retention, no FORCE
    bad.foreach { s =>
      val e = intercept[Exception](g.sql(s))
      assert(e.getMessage != null && e.getMessage.nonEmpty, s"silent on: $s")
    }
    // unbalanced paren in a USING subquery dies in balancedEnd, loudly
    intercept[Exception](g.sql(
      "MERGE INTO tgt USING (SELECT 1 AS id s ON tgt.id = s.id " +
        "WHEN MATCHED THEN DELETE"))
  }
}

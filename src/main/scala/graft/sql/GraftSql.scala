package graft.sql

import java.nio.file.Paths

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables._

/** SQL front-end: a thin statement router that gives the reference's SQL
  * dialect (SURVEY.md §7.4) over the engine.
  *
  * Spark 4 already accepts `expr::type`, `SELECT * EXCEPT`, `DECLARE/SET
  * VARIABLE` and `ILIKE` natively, so the router only adds:
  *
  *  - `col:path::type` JSON path projection → `get_json_object` rewrite
  *    (`DP/Step 1:318-322`)
  *  - engine statements over GraftTables: COPY INTO, MERGE INTO, OPTIMIZE,
  *    DESCRIBE HISTORY, RESTORE, VACUUM, TRUNCATE, DELETE, UPDATE,
  *    CREATE TABLE AS SELECT, `VERSION AS OF` time travel
  *
  * Anything else passes through `spark.sql` with catalog tables registered
  * as temp views — so the whole relational surface stays Catalyst's.
  */
final class GraftSql(val spark: SparkSession, val basePath: String) {

  private val catalog = mutable.LinkedHashMap[String, GraftTable]()

  def table(name: String): GraftTable = catalog.getOrElse(name,
    sys.error(s"unknown graft table: $name"))

  def register(name: String, t: GraftTable): Unit = catalog(name) = t

  def createTable(name: String, schema: org.apache.spark.sql.types.StructType,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val t = GraftTable.create(spark, Paths.get(basePath, name).toString, schema, properties)
    register(name, t); t
  }

  def tableNames: Seq[String] = catalog.keys.toSeq

  // ---- entry point -------------------------------------------------------

  def sql(statement: String): DataFrame = {
    // comments go first (outside literals/quoted identifiers; hints
    // survive): every router path below — regex heads, keyword scans,
    // comma splits — then sees comment-free text, so a comment can never
    // hide a clause boundary or leak into a parsed fragment
    val s = SqlText.stripComments(statement).trim.stripSuffix(";").trim
    val u = s.toUpperCase
    if (u.startsWith("COPY INTO")) copyInto(s)
    else if (u.startsWith("MERGE INTO")) merge(s)
    else if (u.startsWith("OPTIMIZE")) optimize(s)
    else if (u.startsWith("DESCRIBE HISTORY")) table(s.split("\\s+")(2)).history
    else if (u.startsWith("RESTORE")) restore(s)
    else if (u.startsWith("VACUUM")) vacuum(s)
    else if (u.startsWith("TRUNCATE")) { table(s.split("\\s+").last).truncate(); emptyResult }
    else if (u.startsWith("DELETE FROM")) delete(s)
    else if (u.startsWith("UPDATE ")) update(s)
    else if (u.startsWith("CREATE OR REFRESH STREAMING TABLE") ||
             u.startsWith("CREATE STREAMING TABLE")) createStreamingTable(s)
    else if (u.startsWith("CREATE BLOOMFILTER INDEX")) bloomIndex(s)
    else if (u.startsWith("CREATE MATERIALIZED VIEW") ||
             u.startsWith("CREATE OR REPLACE MATERIALIZED VIEW")) createMV(s)
    else if (u.startsWith("REFRESH MATERIALIZED VIEW")) refreshMV(s.split("\\s+").last)
    else if (u.startsWith("CREATE TABLE") || u.startsWith("CREATE OR REPLACE TABLE")) ctas(s)
    else if (u.startsWith("ALTER TABLE")) alterTable(s)
    else if (u.startsWith("GRANT") || u.startsWith("REVOKE")) {
      // catalog ACLs are out of engine scope (SURVEY §2.4): accept and log
      org.slf4j.LoggerFactory.getLogger(getClass).info(s"ignoring ACL statement: $s")
      emptyResult
    }
    else passthrough(s)
  }

  // ---- materialized views (recompute-on-refresh, `DP/Step 6:140-152`) ----

  private def createMV(s: String): DataFrame = {
    val re = "(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?MATERIALIZED\\s+VIEW\\s+(\\w+)\\s+AS\\s+(.*)".r
    s match {
      case re(name, select) =>
        val df = passthrough(select)
        val path = Paths.get(basePath, name).toString
        val t =
          if (catalog.contains(name)) { val x = table(name); x.overwrite(df); x }
          else GraftTable.createFrom(spark, path, df)
        t.setProperties(Map("graft.mv.definition" -> select.trim))
        register(name, t)
        emptyResult
      case _ => sys.error(s"cannot parse CREATE MATERIALIZED VIEW: $s")
    }
  }

  /** `CREATE OR REFRESH STREAMING TABLE t AS <select>` (`DP/Step 6:63-76`):
    * incremental-refresh semantics — the definition is stored and re-run on
    * each CREATE OR REFRESH, mirroring the ST/MV orchestrator's blocking
    * refresh (`HF/stmvorchestrator.py`). */
  private def createStreamingTable(s: String): DataFrame = {
    val re = "(?is)CREATE\\s+(?:OR\\s+REFRESH\\s+)?STREAMING\\s+TABLE\\s+(\\w+)\\s+AS\\s+(.*)".r
    s match {
      case re(name, select) =>
        val df = passthrough(select)
        if (catalog.contains(name)) table(name).overwrite(df, "REFRESH STREAMING TABLE")
        else {
          val t = GraftTable.createFrom(spark, Paths.get(basePath, name).toString, df)
          t.setProperties(Map("graft.st.definition" -> select.trim))
          register(name, t)
        }
        emptyResult
      case _ => sys.error(s"cannot parse CREATE STREAMING TABLE: $s")
    }
  }

  /** `CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS(c1, c2 ...)`
    * (`DP/Step 1:308-313`): future writes carry parquet column bloom
    * filters for those columns. */
  private def bloomIndex(s: String): DataFrame = {
    val re = "(?is)CREATE\\s+BLOOMFILTER\\s+INDEX\\s+ON\\s+(?:TABLE\\s+)?(\\w+)\\s+FOR\\s+COLUMNS\\s*\\(([^)]*)\\)".r
    s match {
      case re(name, cols) =>
        val cleaned = splitTopLevel(cols).map(_.trim.split("\\s+")(0)).mkString(",")
        table(name).setProperties(Map("graft.bloomFilterColumns" -> cleaned))
        emptyResult
      case _ => sys.error(s"cannot parse CREATE BLOOMFILTER INDEX: $s")
    }
  }

  private def refreshMV(name: String): DataFrame = {
    val t = table(name)
    val defn = t.properties.getOrElse("graft.mv.definition",
      sys.error(s"$name is not a materialized view"))
    t.overwrite(passthrough(defn), "REFRESH MATERIALIZED VIEW")
    emptyResult
  }

  /** Run a `;`-separated chain (the reference's notebook-cell pattern,
    * `HF/transactions.py:489-526`); returns the last result. Splitting is
    * quote-aware — a ';' inside a string literal does not break the
    * statement. */
  def sqlChain(statements: String): DataFrame =
    // strip before splitting: a ';' inside a comment must not split the
    // chain (sql() re-strips per statement; stripping is idempotent)
    SqlText.splitStatements(SqlText.stripComments(statements))
      .map(sql).lastOption.getOrElse(emptyResult)

  private def emptyResult: DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("result")
  }

  // ---- pass-through SELECT/SQL with rewrites -----------------------------

  private def passthrough(s: String): DataFrame = {
    catalog.foreach { case (n, t) => t.read().createOrReplaceTempView(n) }
    spark.sql(rewriteQualify(
      rewriteFileTvfs(rewriteTableChanges(rewriteTimeTravel(JsonPathRewrite(s))))))
  }

  /** `QUALIFY <pred>` (window-function filtering without a subquery —
    * DuckDB/Snowflake/BigQuery syntax; Spark has no native support):
    * the predicate is injected into the select list as a boolean column
    * (lateral column aliases make select-list aliases referable from it),
    * the query is wrapped, and the wrapper filters on it:
    *
    *   SELECT <list> FROM t QUALIFY <pred> [ORDER BY/LIMIT ...]
    *   → SELECT * EXCEPT (__q) FROM
    *       (SELECT <list>, (<pred>) AS __q FROM t) WHERE __q [...]
    *
    * `SELECT DISTINCT` is honored by moving DISTINCT to the wrapper
    * (QUALIFY evaluates before DISTINCT in every engine that has it, so
    * the window predicate must see pre-distinct rows and the __q helper
    * column must not widen the distinct key). Top-level query block only
    * (subquery QUALIFYs are out of scope); quote-, comment- and
    * paren-aware so literals, quoted identifiers, comments, and CTE
    * bodies never match. A bare column alias literally named `qualify`
    * would still trigger — it is a reserved word in every QUALIFY
    * dialect, so that spelling is rejected rather than guessed at. */
  private def rewriteQualify(s: String): String = {
    val qi = SqlText.topLevelIndexOf(s, "QUALIFY")
    if (qi < 0) s
    else {
      val predEnd = Seq(
        SqlText.topLevelIndexOf(s, "ORDER", qi + 7),
        SqlText.topLevelIndexOf(s, "LIMIT", qi + 7))
        .filter(_ >= 0).sorted.headOption.getOrElse(s.length)
      val pred = s.substring(qi + "QUALIFY".length, predEnd).trim
      val prefix = s.substring(0, qi).trim
      val suffix = s.substring(predEnd)
      val fi = SqlText.topLevelIndexOf(prefix, "FROM")
      require(fi >= 0, "QUALIFY requires a FROM clause")
      val si = SqlText.topLevelIndexOf(prefix, "SELECT")
      val di = SqlText.topLevelIndexOf(prefix, "DISTINCT")
      val isDistinct = si >= 0 && di > si && di < fi &&
        prefix.substring(si + "SELECT".length, di).trim.isEmpty
      val inner =
        if (isDistinct) // strip DISTINCT from the inner block; reapply outside
          prefix.substring(0, si) + "SELECT" +
            prefix.substring(di + "DISTINCT".length)
        else prefix
      val innerFi = SqlText.topLevelIndexOf(inner, "FROM")
      val injected =
        inner.substring(0, innerFi).trim + s", ($pred) AS __q " + inner.substring(innerFi)
      val outerSel = if (isDistinct) "SELECT DISTINCT" else "SELECT"
      s"$outerSel * EXCEPT (__q) FROM ($injected) WHERE __q $suffix"
    }
  }

  /** `cloud_files('path', 'format')` / `read_files('path', format =>
    * 'fmt')` TVFs (`DP/Step 3:33-66`, `DP/Step 6:73-76`): SQL-level file
    * ingestion — batch-resolved here; the streaming variant is the
    * AutoLoad API. */
  private def rewriteFileTvfs(s: String): String = {
    val cf = "(?i)cloud_files\\s*\\(\\s*'([^']+)'\\s*,\\s*'(\\w+)'\\s*\\)".r
    val rf = "(?i)read_files\\s*\\(\\s*'([^']+)'\\s*(?:,\\s*format\\s*=>\\s*'(\\w+)')?[^)]*\\)".r
    def load(path: String, fmt: String): String = {
      val viewName = "files_" + Integer.toHexString((path + fmt).hashCode).takeWhile(_ != '-')
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.format(fmt).load(path).createOrReplaceTempView(viewName)
      viewName
    }
    val a = cf.replaceAllIn(s, m => load(m.group(1), m.group(2).toLowerCase))
    rf.replaceAllIn(a, m =>
      load(m.group(1), Option(m.group(2)).map(_.toLowerCase).getOrElse("parquet")))
  }

  /** `table_changes('t', v)` TVF → temp view over the change feed
    * (`DP/Advanced CDC:271,395`). Unregistered names are left untouched
    * for Spark to report. */
  private def rewriteTableChanges(s: String): String = {
    val re = "(?i)table_changes\\s*\\(\\s*'(\\w+)'\\s*,\\s*(\\d+)\\s*\\)".r
    re.replaceAllIn(s, m => {
      if (!catalog.contains(m.group(1))) scala.util.matching.Regex.quoteReplacement(m.matched)
      else {
        val viewName = s"${m.group(1)}__changes_${m.group(2)}"
        table(m.group(1)).changes(m.group(2).toLong).createOrReplaceTempView(viewName)
        viewName
      }
    })
  }

  /** `FROM t VERSION AS OF n` / `FROM t TIMESTAMP AS OF 'ts'` → temp
    * view of the snapshot. Runs only outside string literals, and only
    * rewrites identifiers registered in the catalog — anything else
    * passes through unchanged. */
  private def rewriteTimeTravel(s: String): String = {
    val versioned = SqlText.mapOutsideLiterals(s) { seg =>
      val re = "(?i)\\b(\\w+)\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)".r
      re.replaceAllIn(seg, m => {
        val (name, v) = (m.group(1), m.group(2).toLong)
        if (!catalog.contains(name)) scala.util.matching.Regex.quoteReplacement(m.matched)
        else {
          val viewName = s"${name}__v$v"
          table(name).read(versionAsOf = v).createOrReplaceTempView(viewName)
          viewName
        }
      })
    }
    // TIMESTAMP AS OF carries a quoted literal operand, so the rewrite
    // walks the (text, isLiteral) runs: the `name TIMESTAMP AS OF` tail
    // must sit OUTSIDE literals, and only then does the immediately
    // following literal become the operand — a regex over the full text
    // could match across literal boundaries (a literal CONTAINING the
    // phrase would capture the text between two literals as its
    // "timestamp") and break a valid passthrough query.
    val segs = SqlText.segments(versioned)
    val tailRe = "(?is)^(.*?(?:^|\\W))?(\\w+)(\\s+TIMESTAMP\\s+AS\\s+OF\\s*)$".r
    val out = new StringBuilder
    var i = 0
    while (i < segs.length) {
      val (txt, isLit) = segs(i)
      val litNext = i + 1 < segs.length && segs(i + 1)._2
      val rewritten = if (isLit || !litNext) None else txt match {
        case tailRe(prefix, name, _) if catalog.contains(name) =>
          val operand = segs(i + 1)._1.stripPrefix("'").stripSuffix("'")
          val tsMs = parseTsLiteral(operand)
          val t = table(name)
          val v = t.versionAtTimestamp(tsMs)
          val viewName = s"${name}__v$v"
          t.read(versionAsOf = v).createOrReplaceTempView(viewName)
          Some(Option(prefix).getOrElse("") + viewName)
        case _ => None
      }
      rewritten match {
        case Some(r) => out ++= r; i += 2 // consumed the operand literal
        case None => out ++= txt; i += 1
      }
    }
    out.toString
  }

  /** 'yyyy-MM-dd[ HH:mm:ss[.fff]]' → epoch ms (JVM zone, matching the
    * zone DESCRIBE HISTORY renders commit timestamps in). */
  private def parseTsLiteral(lit: String): Long = {
    val t = lit.trim
    if (t.matches("\\d{4}-\\d{2}-\\d{2}")) java.sql.Date.valueOf(t).getTime
    else java.sql.Timestamp.valueOf(t).getTime
  }

  // ---- COPY INTO ---------------------------------------------------------

  private val copyRe =
    ("(?is)COPY\\s+INTO\\s+(\\w+)\\s+FROM\\s+(?:'([^']+)'|\\(\\s*SELECT\\s+(.*?)\\s+FROM\\s+'([^']+)'\\s*\\))" +
      "\\s+FILEFORMAT\\s*=\\s*(\\w+)" +
      "(?:\\s+PATTERN\\s*=\\s*'([^']+)')?" +
      "(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?" +
      "(?:\\s+COPY_OPTIONS\\s*\\(([^)]*)\\))?\\s*").r

  private def parseKvList(s: String): Map[String, String] =
    if (s == null || s.trim.isEmpty) Map.empty
    else splitTopLevel(s).map(_.trim).filter(_.nonEmpty).map { kv =>
      // quote-aware comma split above: a value literal like 'a,b' is one
      // option, not two truncated ones
      val Array(k, v) = kv.split("=", 2).map(_.trim.stripPrefix("'").stripSuffix("'"))
      k -> v
    }.toMap

  private def copyInto(s: String): DataFrame = s match {
    case copyRe(name, directPath, projs, subqueryPath, fmt, pattern, fmtOpts, copyOpts) =>
      val t = table(name)
      val path = Option(directPath).getOrElse(subqueryPath)
      val opts = parseKvList(fmtOpts)
      val copts = parseKvList(copyOpts)
      val transform: DataFrame => DataFrame =
        if (projs == null) identity
        else df => df.selectExpr(splitTopLevel(projs): _*)
      val n = Ingest.copyInto(t, path,
        format = fmt.toLowerCase,
        options = opts,
        pattern = Option(pattern).getOrElse("*"),
        transform = transform,
        force = copts.getOrElse("force", "false").toBoolean)
      import spark.implicits._
      Seq(n).toDF("num_affected_rows")
    case _ => sys.error(s"cannot parse COPY INTO: $s")
  }

  // ---- MERGE INTO --------------------------------------------------------

  /** Split on top-level commas — not inside parens, string literals
    * (both escape forms honored — a backslash-escaped quote must not
    * desync the quote parity, the SqlText contract), or quoted
    * identifiers: a backtick name like `` `a, b` `` is ONE identifier
    * and its comma must not split an assignment list (review finding;
    * comments never reach here — [[sql]] strips them up front). */
  private def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var depth = 0; var inQ = false; var inD = false; var inB = false
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\\' && i + 1 < s.length) { cur += c; cur += s.charAt(i + 1); i += 1 }
        else { if (c == '\'') inQ = false; cur += c }
      } else if (inD) { if (c == '"') inD = false; cur += c }
      else if (inB) { if (c == '`') inB = false; cur += c }
      else if (c == '\'') { inQ = true; cur += c }
      else if (c == '"') { inD = true; cur += c }
      else if (c == '`') { inB = true; cur += c }
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (depth == 0 && c == sep) {
        out += cur.toString.trim; cur.clear()
      } else cur += c
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  /** Strip surrounding backticks off a parsed assignment-target name so
    * it matches the raw schema field name (`` `my col` = v `` assigns
    * column "my col"). */
  private def unquoteIdent(k: String): String = {
    val t = k.trim
    if (t.length >= 2 && t.startsWith("`") && t.endsWith("`"))
      t.substring(1, t.length - 1)
    else t
  }

  /** First case-insensitive WORD-BOUNDED occurrence of keyword `kw` at or
    * after `from` that sits OUTSIDE single-quoted literals, quoted
    * identifiers, comments, and parens, or -1; returns the index of the
    * keyword itself. Word boundaries (any non-identifier char:
    * whitespace incl. newlines/tabs, parens, quotes) replace the old
    * single-space-delimited tokens, so `SET v = 1\nWHERE id = 2` parses
    * like its one-line form. Delegates to [[SqlText.topLevelIndexOf]] —
    * the module's ONE quote-state scanner: it matches in place via
    * regionMatches (a toUpperCase copy can CHANGE LENGTH — 'ß' → "SS" —
    * desyncing every index, and is locale-sensitive) and honors both
    * literal escape forms (doubled '' and backslash), per the SqlText
    * contract the fuzz spec pins. The keyword-in-a-literal router trap:
    * `ON t.v <> 'WHEN MATCHED'` must not start the WHEN clauses early. */
  private def indexOfKeywordTopLevel(s: String, kw: String, from: Int = 0): Int =
    SqlText.topLevelIndexOf(s, kw, from)

  /** First top-level THEN that does not belong to an open CASE…END:
    * walks the top-level CASE/THEN/END keywords in text order tracking
    * CASE nesting, so the clause-terminating THEN of a MERGE WHEN clause
    * is found even when the clause condition contains an unparenthesized
    * CASE expression (whose own THENs sit at caseDepth > 0). */
  private def indexOfClauseThen(s: String): Int = {
    var from = 0
    var caseDepth = 0
    while (from < s.length) {
      val nc = indexOfKeywordTopLevel(s, "CASE", from)
      val nt = indexOfKeywordTopLevel(s, "THEN", from)
      val ne = indexOfKeywordTopLevel(s, "END", from)
      if (nt < 0) return -1
      val j = Seq(nc, nt, ne).filter(_ >= 0).min
      if (j == nc) { caseDepth += 1; from = j + "CASE".length }
      else if (j == ne) { caseDepth = math.max(0, caseDepth - 1); from = j + "END".length }
      else if (caseDepth == 0) return j
      else from = j + "THEN".length
    }
    -1
  }

  /** Every top-level occurrence (same contract as [[indexOfKeywordTopLevel]]). */
  private def allKeywordsTopLevel(s: String, kw: String, from: Int = 0): Seq[Int] = {
    val out = mutable.ArrayBuffer[Int]()
    var i = indexOfKeywordTopLevel(s, kw, from)
    while (i >= 0) {
      out += i
      i = indexOfKeywordTopLevel(s, kw, i + 1)
    }
    out.toSeq
  }

  /** Index just past the balanced close paren for the open at `start`
    * (escape handling as [[splitTopLevel]]). */
  private def balancedEnd(s: String, start: Int): Int = {
    var depth = 0; var i = start; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ && c == '\\' && i + 1 < s.length) i += 1
      else if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') {
        depth -= 1
        if (depth == 0) return i + 1
      }
      i += 1
    }
    sys.error(s"unbalanced parens in: $s")
  }

  private def merge(s: String): DataFrame = {
    catalog.foreach { case (n, t) => t.read().createOrReplaceTempView(n) }
    // manual scan: MERGE INTO <t> [AS] [a] USING <(subquery)|view> [AS] [a]
    // ON <cond> WHEN ... (regexes can't handle arbitrarily nested parens)
    // all clause keywords located TOP-LEVEL (outside literals/parens) at
    // word boundaries: a source literal like 'use ON it WHEN MATCHED'
    // must not move a boundary (regex/indexOf router trap — round-10
    // fuzz finding), and newline/tab-separated clauses must parse like
    // their one-line forms
    val usingIdx = indexOfKeywordTopLevel(s, "USING")
    require(usingIdx > 0, s"cannot parse MERGE INTO: $s")
    val targetTokens = s.substring("MERGE INTO".length, usingIdx)
      .trim.split("\\s+").filterNot(_.equalsIgnoreCase("AS"))
    val (name, tAlias) = (targetTokens(0), targetTokens.lift(1))
    var i = usingIdx + "USING".length
    while (s(i).isWhitespace) i += 1
    val (usingPart, afterUsing) =
      if (s(i) == '(') { val e = balancedEnd(s, i); (s.substring(i, e), e) }
      else { val e = s.indexWhere(c => c.isWhitespace, i); (s.substring(i, e), e) }
    val onIdx = indexOfKeywordTopLevel(s, "ON", afterUsing)
    require(onIdx > 0, s"MERGE missing ON: $s")
    val sAlias = s.substring(afterUsing, onIdx).trim.split("\\s+")
      .filterNot(t => t.isEmpty || t.equalsIgnoreCase("AS")).headOption
    // a clause starts at a top-level "WHEN [NOT] MATCHED" — plain "WHEN"
    // is not enough (CASE WHEN in the ON condition stays where it is)
    val clauseRe = "(?is)^WHEN\\s+(NOT\\s+)?MATCHED\\b.*".r.pattern
    val whenStarts = allKeywordsTopLevel(s, "WHEN", onIdx)
      .filter(ix => clauseRe.matcher(s.substring(ix)).matches())
    require(whenStarts.nonEmpty, s"MERGE missing WHEN clauses: $s")
    val whenIdx = whenStarts.head
    val onCond = s.substring(onIdx + "ON".length, whenIdx).trim
    val clauses = (whenStarts :+ s.length).sliding(2).map {
      case Seq(a, b) => s.substring(a, b).trim }.toSeq
    runMerge(s, name, tAlias, usingPart, sAlias, onCond, clauses)
  }

  private def runMerge(s: String, name: String, tAlias: Option[String],
      usingPart: String, sAlias: Option[String],
      onCond: String, clauses: Seq[String]): DataFrame = {
        val t = table(name)
        val source =
          if (usingPart.startsWith("("))
            spark.sql(JsonPathRewrite(usingPart.stripPrefix("(").stripSuffix(")")))
          else spark.table(usingPart)
        val tq = tAlias.getOrElse(name)
        val sq = sAlias.getOrElse(if (usingPart.startsWith("(")) "source" else usingPart)
        def requalify(e: String): String =
          e.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(tq) + "\\.", "target.")
            .replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(sq) + "\\.", "source.")

        // each clause = "WHEN [NOT] MATCHED [AND <cond>] THEN <action>";
        // THEN is found top-level AND outside any open CASE…END, so
        // neither a literal 'x THEN y' nor a legal unparenthesized
        // CASE WHEN … THEN … END in the condition can split the clause
        // early (review finding)
        val headRe = "(?is)WHEN\\s+(NOT\\s+)?MATCHED(?:\\s+AND\\s+(.*))?".r
        var matched = Seq.empty[MergeOps.WhenMatched]
        var notMatched = Seq.empty[MergeOps.WhenNotMatched]
        clauses.foreach { clause =>
          val thenIdx = indexOfClauseThen(clause)
          require(thenIdx > 0, s"WHEN clause missing THEN: $clause")
          val (isNot, cond) = clause.substring(0, thenIdx).trim match {
            case headRe(not, c) => (not != null, Option(c).map(requalify))
            case h => sys.error(s"bad WHEN clause head: $h")
          }
          val action = clause.substring(thenIdx + "THEN".length).trim
          val au = action.toUpperCase
          if (!isNot) {
            val a =
              if (au == "DELETE") MergeOps.DeleteAction
              else if (au.startsWith("UPDATE")) {
                val setPart = action.replaceFirst("(?is)UPDATE\\s+SET\\s+", "").trim
                if (setPart == "*") MergeOps.UpdateAll
                else MergeOps.UpdateSet(splitTopLevel(setPart).map { kv =>
                  val Array(k, v) = kv.split("=", 2)
                  unquoteIdent(k.trim.replaceFirst(s"(?i)^$tq\\.", "")) ->
                    requalify(v.trim)
                }.toMap)
              } else sys.error(s"bad MATCHED action: $action")
            matched :+= MergeOps.WhenMatched(cond, a)
          } else {
            val a =
              if (au.replaceAll("\\s+", " ") == "INSERT *") MergeOps.InsertAll
              else {
                val insRe = "(?is)INSERT\\s*\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)".r
                action match {
                  case insRe(cols, vals) =>
                    MergeOps.InsertValues(
                      splitTopLevel(cols).map(_.trim)
                        .zip(splitTopLevel(vals).map(v => requalify(v.trim))).toMap)
                  case _ => sys.error(s"bad NOT MATCHED action: $action")
                }
              }
            notMatched :+= MergeOps.WhenNotMatched(cond, a)
          }
        }
        val c = MergeOps.mergeInto(t, source, requalify(onCond), matched, notMatched)
        import spark.implicits._
        Seq(c.version).toDF("version")
  }

  // ---- maintenance statements -------------------------------------------

  private def optimize(s: String): DataFrame = {
    // OPTIMIZE t [WHERE <pred>] [ZORDER BY (...)] [INCREMENTAL] — the
    // WHERE scope compacts only the files whose stats overlap the
    // predicate (Maintenance.optimizeWhere), the shape the
    // delta-optimizer's emitted commands use to target hot partitions
    val re = "(?is)OPTIMIZE\\s+(\\w+)(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?(\\s+INCREMENTAL)?\\s*".r
    s match {
      case re(name, where, z, inc) =>
        val zcols = Option(z).map(splitTopLevel(_).map(_.trim)).getOrElse(Nil)
        if (where != null && inc != null)
          sys.error("OPTIMIZE WHERE cannot be combined with INCREMENTAL")
        val c =
          if (where != null)
            Maintenance.optimizeWhere(table(name), where.trim, zcols)
          else if (inc != null) Maintenance.optimizeIncremental(table(name), zcols)
          else Maintenance.optimize(table(name), zcols)
        import spark.implicits._
        Seq((c.version, c.metrics.getOrElse("numFilesAdded", 0L),
          c.metrics.getOrElse("numFilesRemoved", 0L)))
          .toDF("version", "numFilesAdded", "numFilesRemoved")
      case _ => sys.error(s"cannot parse OPTIMIZE: $s")
    }
  }

  private def restore(s: String): DataFrame = {
    import spark.implicits._
    val re = "(?is)RESTORE\\s+(?:TABLE\\s+)?(\\w+)\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)".r
    val tsRe = "(?is)RESTORE\\s+(?:TABLE\\s+)?(\\w+)\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'".r
    s match {
      case re(name, v) =>
        table(name).restoreTo(v.toLong)
        Seq(v.toLong).toDF("restored_to_version")
      case tsRe(name, lit) =>
        val t = table(name)
        val v = t.versionAtTimestamp(parseTsLiteral(lit))
        t.restoreTo(v)
        Seq(v).toDF("restored_to_version")
      case _ => sys.error(s"cannot parse RESTORE: $s")
    }
  }

  /** VACUUM t [RETAIN n VERSIONS | RETAIN n HOURS] [FORCE]. Defaults to
    * the 7-day safety window (GraftTable.vacuum()); zero retention
    * deletes every non-current file — breaking time travel, RESTORE,
    * shallow clones, and transaction rollback — so it requires FORCE. */
  private def vacuum(s: String): DataFrame = {
    val re = "(?is)VACUUM\\s+(\\w+)(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS))?(\\s+FORCE)?\\s*".r
    val deleted = s match {
      case re(name, n, unit, force) =>
        val t = table(name)
        Option(n).map(_.toLong) match {
          case None => t.vacuum()
          case Some(v) =>
            val retainVersions =
              if (unit.equalsIgnoreCase("HOURS")) t.versionsWithinHours(v.toDouble)
              else v.toInt
            if (retainVersions == 0 && force == null)
              sys.error("VACUUM RETAIN 0 deletes all history (time travel, " +
                "RESTORE, clones); add FORCE to proceed")
            t.vacuum(retainVersions)
        }
      case _ => sys.error(s"cannot parse VACUUM: $s")
    }
    import spark.implicits._
    Seq(deleted.size.toLong).toDF("files_deleted")
  }

  private def delete(s: String): DataFrame = {
    val re = "(?is)DELETE\\s+FROM\\s+(\\w+)(?:\\s+WHERE\\s+(.*))?".r
    s match {
      case re(name, pred) =>
        if (pred == null) table(name).truncate()
        else MergeOps.delete(table(name), pred)
        emptyResult
      case _ => sys.error(s"cannot parse DELETE: $s")
    }
  }

  private def update(s: String): DataFrame = {
    val re = "(?is)UPDATE\\s+(\\w+)\\s+SET\\s+(.*)".r
    s match {
      case re(name, rest) =>
        // WHERE found top-level: a SET literal like 'a WHERE b' must not
        // split the statement early (the lazy-regex router trap)
        val wIdx = indexOfKeywordTopLevel(rest, "WHERE")
        val (setPart, pred) =
          if (wIdx >= 0) (rest.substring(0, wIdx),
            rest.substring(wIdx + "WHERE".length))
          else (rest, "true")
        val assignments = splitTopLevel(setPart).map { kv =>
          val Array(k, v) = kv.split("=", 2); unquoteIdent(k) -> v.trim
        }.toMap
        MergeOps.update(table(name), assignments, pred)
        emptyResult
      case _ => sys.error(s"cannot parse UPDATE: $s")
    }
  }

  /** ALTER TABLE: CLUSTER BY (liquid-clustering layout key), SET
    * TBLPROPERTIES, SYNC IDENTITY. */
  private def alterTable(s: String): DataFrame = {
    val cluster = "(?is)ALTER\\s+TABLE\\s+(\\w+)\\s+CLUSTER\\s+BY\\s*(?:\\(([^)]*)\\)|(NONE))\\s*".r
    val props = "(?is)ALTER\\s+TABLE\\s+(\\w+)\\s+SET\\s+TBLPROPERTIES\\s*\\(([^)]*)\\)\\s*".r
    val sync = "(?is)ALTER\\s+TABLE\\s+(\\w+)\\s+SYNC\\s+IDENTITY\\s*".r
    s match {
      case cluster(name, cols, none) =>
        val v = if (none != null) "" else
          splitTopLevel(cols).map(_.trim).filter(_.nonEmpty).mkString(",")
        table(name).setProperties(Map("graft.clusterBy" -> v))
      case props(name, kvs) => table(name).setProperties(parseKvList(kvs))
      case sync(name) => table(name).syncIdentity()
      case _ => sys.error(s"cannot parse ALTER TABLE: $s")
    }
    emptyResult
  }

  private def ctas(s: String): DataFrame = {
    val re = ("(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE\\s+(\\w+)" +
      "(?:\\s+CLUSTER\\s+BY\\s*\\(([^)]*)\\))?" +
      "(?:\\s+TBLPROPERTIES\\s*\\(([^)]*)\\))?\\s+AS\\s+(.*)").r
    s match {
      case re(name, cluster, props, select) =>
        val df = passthrough(select)
        val path = Paths.get(basePath, name).toString
        val clusterProps = Option(cluster)
          .map(c => Map("graft.clusterBy" ->
            splitTopLevel(c).map(_.trim).filter(_.nonEmpty).mkString(",")))
          .getOrElse(Map.empty)
        if (catalog.contains(name) || GraftTable.exists(path)) {
          val t = if (catalog.contains(name)) table(name) else GraftTable.load(spark, path)
          t.overwrite(df)
          if (clusterProps.nonEmpty) t.setProperties(clusterProps)
          register(name, t)
        } else {
          register(name, GraftTable.createFrom(spark, path, df,
            parseKvList(props) ++ clusterProps))
        }
        emptyResult
      case _ => sys.error(s"cannot parse CREATE TABLE: $s")
    }
  }
}

/** Quote-aware text helpers for the SQL router: single-quoted literals
  * must survive regex rewrites and ';' splitting. Both Spark escape forms
  * are honored inside literals — doubled `''` (two adjacent literals to
  * the scanner, same net effect) and backslash `\'` (the backslash
  * consumes the next char, so the quote does NOT close the literal:
  * `'it\'s; done'` stays one literal and its `;` never splits). */
object SqlText {

  /** (text, isLiteral) runs of `sql`; literal runs include their quotes. */
  private def runs(sql: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.Buffer[(String, Boolean)]()
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQuote) {
        if (c == '\\' && i + 1 < sql.length) { cur += c; cur += sql.charAt(i + 1); i += 1 }
        else if (c == '\'') {
          cur += c; out += ((cur.toString, true)); cur.clear(); inQuote = false
        } else cur += c
      } else if (c == '\'') {
        if (cur.nonEmpty) out += ((cur.toString, false))
        cur.clear(); cur += c; inQuote = true
      } else cur += c
      i += 1
    }
    if (cur.nonEmpty) out += ((cur.toString, inQuote))
    out.toSeq
  }

  /** Apply `f` to every segment of `sql` outside single-quoted literals. */
  def mapOutsideLiterals(sql: String)(f: String => String): String =
    runs(sql).map { case (s, lit) => if (lit) s else f(s) }.mkString

  /** The (text, isLiteral) runs — for rewrites whose OPERAND is a literal
    * (e.g. `TIMESTAMP AS OF 'ts'`): the keyword must sit outside
    * literals but the adjacent literal belongs to the rewrite. */
  private[sql] def segments(sql: String): Seq[(String, Boolean)] = runs(sql)

  /** Index of the first word-boundary occurrence of `kw` (case-insensitive)
    * at parenthesis depth 0, outside single-quoted literals, outside
    * double-quoted / backtick-quoted identifiers, and outside `--` and
    * `/* */` comments, or -1. Lets clause-level rewrites skip subqueries,
    * CTE bodies, quoted names, and commented-out text. */
  def topLevelIndexOf(sql: String, kw: String, from: Int = 0): Int = {
    var inQuote = false   // '...'
    var inDQuote = false  // "..."
    var inBTick = false   // `...`
    var depth = 0
    var i = 0
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQuote) {
        if (c == '\\' && i + 1 < sql.length) i += 1
        else if (c == '\'') inQuote = false
      } else if (inDQuote) {
        if (c == '"') inDQuote = false
      } else if (inBTick) {
        if (c == '`') inBTick = false
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        val nl = sql.indexOf('\n', i)
        i = if (nl < 0) sql.length else nl
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        i = if (end < 0) sql.length else end + 1
      } else c match {
        case '\'' => inQuote = true
        case '"' => inDQuote = true
        case '`' => inBTick = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (i >= from && depth == 0 &&
              sql.regionMatches(true, i, kw, 0, kw.length) &&
              (i == 0 || !isIdent(sql.charAt(i - 1))) &&
              (i + kw.length >= sql.length || !isIdent(sql.charAt(i + kw.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Remove `--` line comments and block comments occurring OUTSIDE
    * string literals and quoted identifiers (`"…"`, `` `…` ``) — comment
    * markers inside a literal are payload and survive byte-for-byte.
    * Optimizer hints (`/*+ … */`) are preserved verbatim: they are
    * semantics, not commentary. A removed line comment keeps its
    * terminating newline and a removed block comment leaves one space,
    * so token boundaries survive (`a/*x*/b` → `a b`, never `ab`). */
  def stripComments(sql: String): String = {
    val out = new StringBuilder
    var inQ = false; var inD = false; var inB = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQ) {
        if (c == '\\' && i + 1 < sql.length) { out += c; out += sql.charAt(i + 1); i += 1 }
        else { if (c == '\'') inQ = false; out += c }
      } else if (inD) { if (c == '"') inD = false; out += c }
      else if (inB) { if (c == '`') inB = false; out += c }
      else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        val nl = sql.indexOf('\n', i)
        i = (if (nl < 0) sql.length else nl) - 1 // the '\n' itself survives
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*' &&
                 !(i + 2 < sql.length && sql.charAt(i + 2) == '+')) {
        val e = sql.indexOf("*/", i + 2)
        i = (if (e < 0) sql.length else e + 2) - 1
        out += ' '
      } else {
        if (c == '\'') inQ = true
        else if (c == '"') inD = true
        else if (c == '`') inB = true
        out += c
      }
      i += 1
    }
    out.toString
  }

  /** Split a chain on ';' occurring outside single-quoted literals. */
  def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    runs(sql).foreach {
      case (s, true) => cur ++= s
      case (s, false) =>
        var rest = s
        var j = rest.indexOf(';')
        while (j >= 0) {
          cur ++= rest.substring(0, j)
          out += cur.toString; cur.clear()
          rest = rest.substring(j + 1)
          j = rest.indexOf(';')
        }
        cur ++= rest
    }
    out += cur.toString
    out.iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

/** `col:path::type` / `col:path` JSON path syntax → `get_json_object`
  * (rewrite happens outside string literals only). */
object JsonPathRewrite {
  // path segments: .field and [index] hops (details:a.b[0].c::bigint)
  private val seg = "(?:\\w+)(?:(?:\\.\\w+)|(?:\\[\\d+\\]))*"
  private val withCast = s"(?<![\\w:'])(\\w+):($seg)::(\\w+)".r
  private val noCast = s"(?<![\\w:'])(\\w+):($seg)(?![\\w:(\\[])".r

  def apply(sql: String): String =
    // rewrite only unquoted segments (same literal scanner as SqlText,
    // so backslash-escaped quotes don't desync the segmentation)
    SqlText.mapOutsideLiterals(sql) { p =>
      val a = withCast.replaceAllIn(p, m =>
        s"CAST(get_json_object(${m.group(1)}, '@@DOLLAR@@.${m.group(2)}') AS ${m.group(3)})")
      noCast.replaceAllIn(a, m =>
        s"get_json_object(${m.group(1)}, '@@DOLLAR@@.${m.group(2)}')")
    }.replace("@@DOLLAR@@", "$")
}

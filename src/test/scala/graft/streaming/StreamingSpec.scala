package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("expectations: fail mode throws, drop filters, warn keeps") {
    val df = Seq((1, 10.0), (2, -5.0), (3, 7.0)).toDF("id", "v")
    intercept[Expectations.ExpectationFailedException] {
      Expectations(df, Seq(Expectations.expectOrFail("pos", "v > 0"))).count()
    }
    assert(Expectations(df, Seq(Expectations.expectOrDrop("pos", "v > 0"))).count() === 2)
    assert(Expectations(df, Seq(Expectations.expect("pos", "v > 0"))).count() === 3)
  }

  test("quarantine splits pass/fail") {
    val df = Seq((1, 10.0), (2, -5.0)).toDF("id", "v")
    val (ok, bad) = Expectations.quarantine(df,
      Seq(Expectations.expect("pos", "v > 0")))
    assert(ok.collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(bad.collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("pipeline detects dependency cycles") {
    val p = new Pipeline(spark)
    p.table("a", deps = Seq("b"))(_ => spark.range(1).toDF())
    p.table("b", deps = Seq("a"))(_ => spark.range(1).toDF())
    intercept[IllegalArgumentException] { p.run() }
  }

  test("pipeline event log records rows and violations per flow") {
    val p = new Pipeline(spark)
    p.table("src")(_ => Seq((1, 10.0), (2, -5.0), (3, 7.0)).toDF("id", "v"))
    p.table("clean", deps = Seq("src"),
      expectations = Seq(Expectations.expectOrDrop("pos", "v > 0")))(
      live => live("src"))
    p.run()
    val ev = p.events.map(e => e.flow -> (e.rows, e.violations)).toMap
    assert(ev("src")._1 === 3)
    assert(ev("clean")._1 === 2)
    assert(ev("clean")._2 === Map("pos" -> 1L))
  }

  test("autoLoad persists inferred schema and rescues corrupt json rows") {
    val dir = scratch("al-src")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "a.json"),
      "{\"id\": 1, \"v\": \"x\"}\n{\"id\": bad}\n".getBytes("UTF-8"))
    val schemaLoc = scratch("al-schema")
    val stream = AutoLoad.readStream(spark, dir, "json", schemaLoc)
    val qn = "al_sink"
    val q = stream.writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", scratch("al-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table(qn).collect()
    assert(out.length === 2)
    assert(out.count(r => r.getAs[String]("_rescued_data") != null) === 1)
    // schema file persisted for deterministic restart
    assert(Files.exists(Paths.get(schemaLoc, "_schema.json")))
  }

  test("tableStream streams appends from a GraftTable exactly once") {
    val src = graft.tables.GraftTable.createFrom(spark, scratch("ts-src"),
      Tables.t(spark, sf, "region"))
    val sink = graft.tables.GraftTable.create(spark, scratch("ts-sink"),
      src.schemaAt())
    val ckpt = scratch("ts-ckpt")
    StreamOps.appendStream(StreamOps.tableStream(src), sink, ckpt)
    assert(sink.read().count() === 5)
    src.append(Tables.t(spark, sf, "nation")
      .selectExpr("n_nationkey AS r_regionkey", "n_name AS r_name").limit(3))
    StreamOps.appendStream(StreamOps.tableStream(src), sink, ckpt)
    assert(sink.read().count() === 8) // only the 3 new rows arrived
  }

  test("incremental streaming: second run picks up only new files") {
    val dir = scratch("inc-src")
    Files.createDirectories(Paths.get(dir))
    Tables.t(spark, sf, "events").limit(100).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch1")
    val tbl = graft.tables.GraftTable.create(spark, scratch("inc-tbl"),
      Tables.t(spark, sf, "events").schema)
    val ckpt = scratch("inc-ckpt")
    def runOnce(): Unit = StreamOps.appendStream(
      spark.readStream.schema(Tables.t(spark, sf, "events").schema)
        .parquet(dir + "/batch1"), tbl, ckpt)
    runOnce()
    assert(tbl.read().count() === 100)
    runOnce() // no new files → no new rows (exactly-once via checkpoint)
    assert(tbl.read().count() === 100)
  }
}

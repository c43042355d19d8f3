package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private val scd2Schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("_start_at", StringType), StructField("_end_at", StringType),
    StructField("_is_current", BooleanType)))

  test("scd2 chains versions across three batches") {
    val t = GraftTable.create(spark, scratch("scd2"), scd2Schema)
    def batch(seq: String, rows: (Long, String)*) =
      rows.toSeq.toDF("id", "name").withColumn("_seq", lit(seq))

    Scd.scd2Merge(t, batch("2024-01-01", 1L -> "a", 2L -> "b"),
      Seq("id"), Seq("name"), "_seq")
    Scd.scd2Merge(t, batch("2024-02-01", 1L -> "a2", 3L -> "c"),
      Seq("id"), Seq("name"), "_seq")
    Scd.scd2Merge(t, batch("2024-03-01", 1L -> "a3"),
      Seq("id"), Seq("name"), "_seq")

    val rows = t.read().orderBy("id", "_start_at")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), Option(r.getString(3)), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      (1L, "a", "2024-01-01", Some("2024-02-01"), false),
      (1L, "a2", "2024-02-01", Some("2024-03-01"), false),
      (1L, "a3", "2024-03-01", None, true),
      (2L, "b", "2024-01-01", None, true),
      (3L, "c", "2024-02-01", None, true)))
  }

  test("scd2 unchanged rows are not re-versioned") {
    val t = GraftTable.create(spark, scratch("scd2same"), scd2Schema)
    def batch(seq: String, rows: (Long, String)*) =
      rows.toSeq.toDF("id", "name").withColumn("_seq", lit(seq))
    Scd.scd2Merge(t, batch("2024-01-01", 1L -> "a"), Seq("id"), Seq("name"), "_seq")
    Scd.scd2Merge(t, batch("2024-02-01", 1L -> "a"), Seq("id"), Seq("name"), "_seq")
    assert(t.read().count() === 1) // same value → single current row
  }

  test("scd2 out-of-order: rows older than the applied head are dropped") {
    val t = GraftTable.create(spark, scratch("scd2ooo"), scd2Schema)
    def batch(seq: String, rows: (Long, String)*) =
      rows.toSeq.toDF("id", "name").withColumn("_seq", lit(seq))
    Scd.scd2Merge(t, batch("2024-05-01", 1L -> "new"), Seq("id"), Seq("name"), "_seq")
    // late batch with an OLDER change must not expire/replace the head
    Scd.scd2Merge(t, batch("2024-02-01", 1L -> "stale"), Seq("id"), Seq("name"), "_seq")
    val rows = t.read().collect()
    assert(rows.length === 1)
    assert(rows.head.getString(1) === "new" && rows.head.getBoolean(4))
  }

  test("scd2 out-of-order event older than an applied delete does not resurrect the key") {
    val t = GraftTable.create(spark, scratch("scd2res"), scd2Schema)
    def cdc(rows: (Long, String, String, String)*) =
      rows.toSeq.toDF("id", "name", "seq", "op")
    Scd.applyChangesScd2(t, cdc((1L, "a", "2024-01-01", "UPSERT")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    Scd.applyChangesScd2(t, cdc((1L, "a", "2024-03-01", "DELETE")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    // late event BETWEEN the insert and the delete: must stay dead
    Scd.applyChangesScd2(t, cdc((1L, "ghost", "2024-02-01", "UPSERT")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    val rows = t.read().collect()
    assert(rows.length === 1, "resurrected a deleted key from a stale event")
    assert(!rows.head.getBoolean(4))
    assert(rows.head.getString(3) === "2024-03-01")
    // a genuinely newer event restarts the chain
    Scd.applyChangesScd2(t, cdc((1L, "reborn", "2024-04-01", "UPSERT")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    val chain = t.read().orderBy("_start_at").collect()
    assert(chain.length === 2)
    assert(chain(1).getString(1) === "reborn" && chain(1).getBoolean(4))
  }

  private val scd2acSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("_start_at", StringType), StructField("_end_at", StringType),
    StructField("_is_current", BooleanType)))

  test("applyChangesScd2: delete expires without successor; later upsert restarts chain") {
    val t = GraftTable.create(spark, scratch("scd2del"), scd2acSchema)
    def cdc(rows: (Long, String, String, String)*) =
      rows.toSeq.toDF("id", "name", "seq", "op")
    Scd.applyChangesScd2(t, cdc((1L, "a", "2024-01-01", "UPSERT")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    Scd.applyChangesScd2(t, cdc((1L, "a", "2024-02-01", "DELETE")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    val afterDelete = t.read().collect()
    assert(afterDelete.length === 1)
    assert(!afterDelete.head.getBoolean(4)) // expired, no current row
    assert(afterDelete.head.getString(3) === "2024-02-01")
    Scd.applyChangesScd2(t, cdc((1L, "c", "2024-03-01", "UPSERT")),
      Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"), exceptCols = Seq("op"))
    val chain = t.read().orderBy("_start_at").collect()
    assert(chain.length === 2)
    assert(chain(1).getString(1) === "c" && chain(1).getBoolean(4))
  }

  test("scd2 rewrite scope: only files holding changed keys' current rows") {
    val t = GraftTable.create(spark, scratch("scd2scope"), scd2Schema)
    def batch(seq: String, rows: (Long, String)*) =
      rows.toSeq.toDF("id", "name").withColumn("_seq", lit(seq))
    // seed keys 1..40 through 4 separate batches → at least 4 data files
    (0 until 4).foreach { b =>
      val rows = (b * 10 + 1 to b * 10 + 10).map(i => i.toLong -> s"v$i")
      Scd.scd2Merge(t, batch("2024-01-01", rows: _*), Seq("id"), Seq("name"), "_seq")
    }
    val filesBefore = t.filesAt().size
    assert(filesBefore >= 4, s"seed must span multiple files, got $filesBefore")
    // change ONE key: the state join knows which file holds its current
    // row, so the merge (touchedFilesHint) must rewrite exactly that file
    val c = Scd.scd2Merge(t, batch("2024-02-01", 7L -> "changed"),
      Seq("id"), Seq("name"), "_seq")
    assert(c.metrics("numTargetFilesRemoved") === 1L,
      s"one changed key must rewrite one file: ${c.metrics}")
    val rows = t.read().filter(col("id") === 7L).orderBy("_start_at")
      .collect().map(r => (r.getString(1), r.getBoolean(4)))
    assert(rows.toSeq === Seq(("v7", false), ("changed", true)))
    assert(t.read().count() === 41)
  }

  test("scd2 expires ALL current rows of a key even when they span files") {
    val t = GraftTable.create(spark, scratch("scd2multi"), scd2Schema)
    // adopt pre-existing data that VIOLATES the one-current-per-key
    // invariant: key 1 has a current row in each of two data files (two
    // separate appends) — the touched-file capture must collect BOTH
    // files or one stale current row survives the merge un-expired
    def seeded(name: String, start: String) =
      Seq((1L, name, start, None: Option[String], true))
        .toDF("id", "name", "_start_at", "_end_at", "_is_current")
    t.append(seeded("a", "2024-01-01"))
    t.append(seeded("b", "2024-01-02"))
    assert(t.filesAt().size === 2)

    Scd.scd2Merge(t, Seq((1L, "c")).toDF("id", "name")
        .withColumn("_seq", lit("2024-03-01")),
      Seq("id"), Seq("name"), "_seq")

    val rows = t.read().orderBy("_start_at")
      .collect().map(r => (r.getString(1), Option(r.getString(3)), r.getBoolean(4)))
    assert(rows.count(_._3) === 1, s"exactly one current row must remain: ${rows.toSeq}")
    assert(rows.toSeq === Seq(
      ("a", Some("2024-03-01"), false),
      ("b", Some("2024-03-01"), false),
      ("c", None, true)))
  }

  private val scd1Schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("seq", LongType)))

  test("applyChanges SCD1 ignores out-of-order older rows") {
    val t = GraftTable.create(spark, scratch("ooo"), scd1Schema)
    val b1 = Seq((1L, "new", 10L), (2L, "x", 5L)).toDF("id", "v", "seq")
      .withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, b1, Seq("id"), "seq")
    // late batch: id=1 with OLDER seq must lose; id=2 with newer seq wins
    val b2 = Seq((1L, "stale", 3L), (2L, "y", 9L)).toDF("id", "v", "seq")
      .withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, b2, Seq("id"), "seq")
    val m = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "new", 2L -> "y"))
  }

  test("applyChanges SCD1 delete-when removes keys") {
    val t = GraftTable.create(spark, scratch("cdcdel"), scd1Schema)
    val b1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "seq")
      .withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, b1, Seq("id"), "seq")
    val b2 = Seq((1L, "a", 2L)).toDF("id", "v", "seq")
      .withColumn("op", lit("DELETE"))
    Scd.applyChangesScd1(t, b2, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    assert(t.read().collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("applyChanges dedupes the batch to latest per key first") {
    val t = GraftTable.create(spark, scratch("dedupb"), scd1Schema)
    val b = Seq((1L, "v1", 1L), (1L, "v2", 2L), (1L, "v3", 3L)).toDF("id", "v", "seq")
      .withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, b, Seq("id"), "seq")
    assert(t.read().collect().map(_.getString(1)).toSeq === Seq("v3"))
  }

  test("applyChanges SCD1 tombstones: a late pre-delete upsert cannot resurrect; a newer one can") {
    val t = GraftTable.create(spark, scratch("cdctomb"), scd1Schema)
    val up = Seq((1L, "live", 1L)).toDF("id", "v", "seq").withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, up, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    val del = Seq((1L, "x", 5L)).toDF("id", "v", "seq").withColumn("op", lit("DELETE"))
    Scd.applyChangesScd1(t, del, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    // late batch carrying a PRE-delete upsert: the delete removed the
    // row's watermark, so only the tombstone ledger can reject this
    val stale = Seq((1L, "zombie", 3L)).toDF("id", "v", "seq").withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, stale, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    assert(t.read().isEmpty, "a pre-delete upsert must not resurrect the key")
    // a genuinely newer upsert recreates the key and clears its tombstone
    val fresh = Seq((1L, "reborn", 9L)).toDF("id", "v", "seq").withColumn("op", lit("UPSERT"))
    Scd.applyChangesScd1(t, fresh, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "reborn")))
    // ledger cleared: a repeat of the stale event still loses (to the live row now)
    Scd.applyChangesScd1(t, stale, Seq("id"), "seq", deleteWhen = Some("op = 'DELETE'"))
    assert(t.read().collect().map(_.getString(1)).toSeq === Seq("reborn"))
  }
}

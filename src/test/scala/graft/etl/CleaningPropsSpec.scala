package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-style checks for the tricky T-SQL-faithful semantics
  * (SURVEY.md §5): yyyyMMdd parsing, the sales-fix rule, and
  * DATEDIFF(month) boundary counting. Uses raw ScalaCheck generators with
  * a fixed seed (no scalatestplus bridge in the offline cache).
  */
class CleaningPropsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    LazyList.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .take(n).toList

  test("intDate: valid yyyyMMdd round-trips, 0/garbage → null") {
    val valid = Gen.choose(0, 3650).map { off =>
      val d = java.time.LocalDate.of(2020, 1, 1).plusDays(off.toLong)
      (d.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE).toInt, Some(d.toString))
    }
    val garbage = Gen.oneOf(0, 1, 2025101, 123, 99999999).map(v => (v, None))
    val cases = samples(Gen.oneOf(valid, garbage), 200)
    val got = cases.map(_._1).toDF("raw")
      .select(Cleaning.intDate(col("raw")).cast("string").as("parsed"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === cases.map(_._2))
  }

  test("fixedSales: always quantity × |price|, or the original valid sales") {
    val gen = for {
      qty <- Gen.choose(1, 50)
      price <- Gen.choose(-500000, 500000).map(c => BigDecimal(c) / 100)
      salesOpt <- Gen.option(Gen.choose(-500000, 5000000).map(c => BigDecimal(c) / 100))
    } yield (salesOpt.orNull, qty, price)
    val cases = samples(gen, 300)
    val rows = cases.toDF("sales", "qty", "price")
      .select(col("sales"), col("qty"), col("price"),
        Cleaning.fixedSales(col("sales"), col("qty"), col("price")).as("fixed"))
      .collect()
    rows.foreach { r =>
      val fixed = BigDecimal(r.getDecimal(3))
      val expected = BigDecimal(r.getInt(1)) * BigDecimal(r.getDecimal(2)).abs
      val orig = Option(r.getDecimal(0)).map(BigDecimal(_))
      if (orig.isEmpty || orig.get <= 0 || orig.get != expected)
        assert(fixed === expected)    // recomputed
      else assert(fixed === orig.get) // kept
    }
  }

  test("datediffMonthBoundary counts calendar crossings like T-SQL DATEDIFF") {
    // 2025-01-31 → 2025-02-01 is 1 month in T-SQL (boundary crossing),
    // though months_between says ~0.03.
    val df = Seq(
      ("2025-01-31", "2025-02-01", 1),
      ("2025-01-01", "2025-12-31", 11),
      ("2024-12-31", "2025-01-01", 1),
      ("2025-03-15", "2025-03-31", 0),
      ("2025-05-10", "2024-05-10", -12)
    ).toDF("a", "b", "expected")
    val got = df.select(
      Cleaning.datediffMonthBoundary(col("a").cast("date"), col("b").cast("date"))
        .as("got"), col("expected")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("scd1Merge is a no-op on an identical source (audit stamps preserved)") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
    val src = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val hashed = Scd.withHash(src, Seq("v"))
    val init = hashed.withColumn("dwh_create_date", lit(t0))
      .withColumn("dwh_update_date", lit(t0))
    val t1 = Timestamp.valueOf("2025-02-01 00:00:00")
    val merged = Scd.scd1Merge(init, hashed, Seq("k"), "dwh_hash_full", t1)
    val rows = merged.orderBy("k").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Timestamp]("dwh_create_date") === t0)
      assert(r.getAs[Timestamp]("dwh_update_date") === t0)
    }
  }

  test("scd2Apply keeps interval invariants over random change sequences") {
    import java.sql.Timestamp
    val keys = 1 to 8
    var table = Scd.scd2Init(
      Scd.withHash(keys.map(k => (k, s"v0_$k")).toDF("k", "v"), Seq("v")),
      Timestamp.valueOf("2025-01-01 00:00:00"))
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { gen =>
      val snapshot = keys.map { k =>
        if (rnd.nextBoolean()) (k, s"v${gen}_$k") else (k, s"v0_$k")
      }
      // a full snapshot includes unchanged keys; changed ones get new versions
      val src = Scd.withHash(snapshot.toDF("k", "v"), Seq("v"))
      table = Scd.scd2Apply(table, src, Seq("k"),
        "dwh_hash_full", Timestamp.valueOf(s"2025-0${gen + 1}-01 00:00:00"))
    }
    val cur = table.filter(col("is_current"))
    // exactly one current row per key
    assert(cur.groupBy("k").count().filter(col("count") =!= 1).count() === 0)
    assert(cur.select("k").distinct().count() === keys.length)
    // expired rows all have expiry dates; current rows have none
    assert(table.filter(!col("is_current") && col("expiry_date").isNull).count() === 0)
    assert(table.filter(col("is_current") && col("expiry_date").isNotNull).count() === 0)
  }
}

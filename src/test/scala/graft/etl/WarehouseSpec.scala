package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Atomic table swaps: the single-rename window must be RECOVERABLE,
  * not just reclaimable — a crash between `target → ._old` and
  * `._tmp → target` leaves no live table, and both the next read and
  * the next rebuild must restore the pre-swap copy instead of failing
  * (r10 ADVICE on swapIn).
  */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def freshWh() = Warehouse(
    Files.createTempDirectory("graft_whspec").toString)

  test("read recovers a table stranded mid-swap in ._old") {
    val wh = freshWh()
    wh.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "gold", "t")
    // simulate the crash window: the live dir was renamed aside and the
    // process died before tmp moved in
    Files.move(Paths.get(wh.path("gold", "t")),
      Paths.get(wh.path("gold", "t._old")), StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(Paths.get(wh.path("gold", "t"))))
    val rows = wh.read(spark, "gold", "t").as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "a"), (2L, "b")))
    assert(Files.exists(Paths.get(wh.path("gold", "t"))))
    assert(!Files.exists(Paths.get(wh.path("gold", "t._old"))))
  }

  test("rebuild after a mid-swap crash restores then swaps; stale ._old reclaimed") {
    val wh = freshWh()
    wh.overwrite(Seq((1L, "a")).toDF("k", "v"), "gold", "t")
    Files.move(Paths.get(wh.path("gold", "t")),
      Paths.get(wh.path("gold", "t._old")), StandardCopyOption.ATOMIC_MOVE)
    // a rebuild whose input is the (recovered) table itself
    wh.rebuild(wh.read(spark, "gold", "t")
      .withColumn("v", org.apache.spark.sql.functions.upper(
        org.apache.spark.sql.functions.col("v"))), "gold", "t")
    val rows = wh.read(spark, "gold", "t").as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "A")))
    assert(!Files.exists(Paths.get(wh.path("gold", "t._old"))))
    // a STALE ._old (swap completed, delete crashed) is reclaimed, not
    // restored over the live table
    Files.createDirectory(Paths.get(wh.path("gold", "t._old")))
    wh.rebuild(wh.read(spark, "gold", "t"), "gold", "t")
    assert(wh.read(spark, "gold", "t").count() === 1L)
    assert(!Files.exists(Paths.get(wh.path("gold", "t._old"))))
  }
}

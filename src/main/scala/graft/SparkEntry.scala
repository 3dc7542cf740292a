package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one named entry per implemented operator/workload from
  * SURVEY.md §2; each takes (session, sfDir) and returns a deterministic
  * DataFrame. `oracleSql`: DuckDB-runnable ANSI SQL equivalents over the
  * same parquet tables for the driver's hash-compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Region revenue share — scan → 3 broadcast joins → exact agg → window. */
  def entry(spark: SparkSession): DataFrame =
    analytics.CoreQueries.queries("q12_part_to_whole_region")(
      spark, "/root/testdata/sf0.001")

  /** Every query pack, in merge order. Kept as an explicit Seq so
    * [[duplicateNames]] can detect a name collision — `++` silently
    * lets a later pack SHADOW an earlier entry (a near-miss in r9:
    * a re-added ann_hard_negatives overwrote nothing visible but lost
    * the merge; the smoke gate now fails on any duplicate). */
  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (analytics.CoreQueries.queries, analytics.CoreQueries.oracleSql),
    (analytics.OperatorQueries.queries, analytics.OperatorQueries.oracleSql),
    (analytics.TextQueries.queries, analytics.TextQueries.oracleSql),
    (analytics.BehaviorQueries.queries, analytics.BehaviorQueries.oracleSql),
    (analytics.StreamingQueries.queries, analytics.StreamingQueries.oracleSql),
    (analytics.ExtendedQueries.queries, analytics.ExtendedQueries.oracleSql),
    (analytics.FrontierQueries.queries, analytics.FrontierQueries.oracleSql),
    (analytics.Frontier2Queries.queries, analytics.Frontier2Queries.oracleSql),
    (analytics.Frontier3Queries.queries, analytics.Frontier3Queries.oracleSql),
    (analytics.Frontier4Queries.queries, analytics.Frontier4Queries.oracleSql),
    (analytics.Frontier5Queries.queries, analytics.Frontier5Queries.oracleSql),
    (analytics.Frontier6Queries.queries, analytics.Frontier6Queries.oracleSql),
    (analytics.Frontier7Queries.queries, analytics.Frontier7Queries.oracleSql),
    (analytics.Frontier8Queries.queries, analytics.Frontier8Queries.oracleSql),
    (analytics.Frontier9Queries.queries, analytics.Frontier9Queries.oracleSql),
    (analytics.Frontier10Queries.queries, analytics.Frontier10Queries.oracleSql),
    (analytics.Frontier11Queries.queries, analytics.Frontier11Queries.oracleSql),
    (analytics.Frontier12Queries.queries, analytics.Frontier12Queries.oracleSql),
    (analytics.Frontier13Queries.queries, analytics.Frontier13Queries.oracleSql),
    (analytics.Frontier14Queries.queries, analytics.Frontier14Queries.oracleSql),
    (analytics.Frontier15Queries.queries, analytics.Frontier15Queries.oracleSql),
    (analytics.Frontier16Queries.queries, analytics.Frontier16Queries.oracleSql),
    (analytics.Frontier17Queries.queries, analytics.Frontier17Queries.oracleSql),
    (analytics.Frontier18Queries.queries, analytics.Frontier18Queries.oracleSql),
    (analytics.Frontier19Queries.queries, analytics.Frontier19Queries.oracleSql),
    (analytics.Frontier20Queries.queries, analytics.Frontier20Queries.oracleSql),
    (analytics.Frontier21Queries.queries, analytics.Frontier21Queries.oracleSql),
    (analytics.Frontier22Queries.queries, analytics.Frontier22Queries.oracleSql),
    (analytics.Frontier23Queries.queries, analytics.Frontier23Queries.oracleSql),
    (analytics.Frontier24Queries.queries, analytics.Frontier24Queries.oracleSql),
    (analytics.Frontier25Queries.queries, analytics.Frontier25Queries.oracleSql),
    (analytics.Frontier26Queries.queries, analytics.Frontier26Queries.oracleSql),
    (analytics.Frontier27Queries.queries, analytics.Frontier27Queries.oracleSql),
    (analytics.Frontier28Queries.queries, analytics.Frontier28Queries.oracleSql),
    (analytics.Frontier29Queries.queries, analytics.Frontier29Queries.oracleSql),
    (analytics.Frontier30Queries.queries, analytics.Frontier30Queries.oracleSql),
    (analytics.Frontier31Queries.queries, analytics.Frontier31Queries.oracleSql),
    (analytics.Frontier32Queries.queries, analytics.Frontier32Queries.oracleSql),
    (analytics.Frontier33Queries.queries, analytics.Frontier33Queries.oracleSql),
    (analytics.Frontier34Queries.queries, analytics.Frontier34Queries.oracleSql),
    (analytics.Frontier35Queries.queries, analytics.Frontier35Queries.oracleSql),
    (analytics.Frontier36Queries.queries, analytics.Frontier36Queries.oracleSql),
    (analytics.Frontier37Queries.queries, analytics.Frontier37Queries.oracleSql),
    (analytics.Frontier38Queries.queries, analytics.Frontier38Queries.oracleSql),
    (analytics.Frontier39Queries.queries, analytics.Frontier39Queries.oracleSql),
    (analytics.Frontier41Queries.queries, analytics.Frontier41Queries.oracleSql),
    (analytics.Frontier42Queries.queries, analytics.Frontier42Queries.oracleSql),
    (analytics.Frontier43Queries.queries, analytics.Frontier43Queries.oracleSql),
    (analytics.Frontier44Queries.queries, analytics.Frontier44Queries.oracleSql),
    (analytics.Frontier45Queries.queries, analytics.Frontier45Queries.oracleSql),
    (analytics.Frontier46Queries.queries, analytics.Frontier46Queries.oracleSql),
    (analytics.Frontier47Queries.queries, analytics.Frontier47Queries.oracleSql),
    (analytics.Frontier48Queries.queries, analytics.Frontier48Queries.oracleSql),
    (analytics.Frontier49Queries.queries, analytics.Frontier49Queries.oracleSql),
    (analytics.Frontier50Queries.queries, analytics.Frontier50Queries.oracleSql),
    (analytics.Frontier51Queries.queries, analytics.Frontier51Queries.oracleSql),
    (analytics.Frontier52Queries.queries, analytics.Frontier52Queries.oracleSql),
    (analytics.Frontier53Queries.queries, analytics.Frontier53Queries.oracleSql),
    (analytics.Frontier54Queries.queries, analytics.Frontier54Queries.oracleSql),
    (analytics.Frontier55Queries.queries, analytics.Frontier55Queries.oracleSql),
    (analytics.Frontier56Queries.queries, analytics.Frontier56Queries.oracleSql),
    (analytics.Frontier57Queries.queries, analytics.Frontier57Queries.oracleSql),
    (analytics.Frontier58Queries.queries, analytics.Frontier58Queries.oracleSql),
    (analytics.Frontier59Queries.queries, analytics.Frontier59Queries.oracleSql),
    (analytics.Frontier60Queries.queries, analytics.Frontier60Queries.oracleSql),
    (analytics.SqlFrontDoorQueries.queries, analytics.SqlFrontDoorQueries.oracleSql))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)

  /** Names defined by more than one pack — must be empty (spec-gated). */
  def duplicateNames: Seq[String] =
    packs.flatMap(_._1.keys).groupBy(identity).filter(_._2.size > 1)
      .keys.toSeq.sorted
}

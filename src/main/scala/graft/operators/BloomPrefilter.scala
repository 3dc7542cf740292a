package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Runtime Bloom prefilter as NATIVE Catalyst expressions — the manual
  * form of `spark.sql.optimizer.runtime.bloomFilter`, for when the build
  * side is a computed frame the optimizer can't see through.
  *
  * Build: `BloomFilterAggregate` over `xxhash64(key)` (distributed, one
  * pass, partial-merge like any aggregate — the hash keeps the child
  * LongType for every key type). Probe: `BloomFilterMightContain` over a
  * binary LITERAL of the serialized filter, which participates in
  * whole-stage codegen — unlike a Scala udf closure, the probe compiles
  * into the scan stage and the filter can be pushed with the rest of the
  * predicate pipeline. The serialized filter transits the driver once
  * (bounded: ~n·9.6 bits ≈ 1.2 MB at 2^20 items — the same bytes a udf
  * closure would broadcast, made explicit).
  *
  * No false negatives, so `probe.filter(mightContain(...))` followed by
  * the exact join is byte-identical to the unfiltered plan — at scale the
  * probe side entering the shuffle shrinks to ~the build selectivity.
  */
object BloomPrefilter {

  /** A codegen-native `might_contain` predicate over `probeKey`, testing
    * membership in the Bloom filter built from `build`'s `buildKey`. */
  def mightContain(build: DataFrame, buildKey: Column, probeKey: Column,
                   expectedItems: Long, fpp: Double = 0.01): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(buildKey)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = build.select(ColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) lit(false) // empty build side admits nothing
    else ColumnBridge.column(BloomFilterMightContain(
      Literal.create(row.getAs[Array[Byte]](0), BinaryType),
      ColumnBridge.expression(xxhash64(probeKey))))
  }
}

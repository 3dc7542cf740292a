package graft.textops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions
import graft.functions.{BpeEncoder, BpeSegmentWith}

/** Corpus-trained BPE: the trainer's merge choices match a hand-traced
  * reference, training is layout-deterministic, and the parameterized
  * encoder applies a trained table exactly like the static one.
  */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("trainer reproduces the hand-traced merge sequence") {
    // vocab: "abab" f=3, "aab" f=2, "cd" f=5 →
    //   round 1 pairs: (a,b) 3·2+2=8, (b,a) 3, (a,a) 2, (c,d) 5 → (a,b)
    //   round 2 (after merge): "ab ab"→(ab,ab) excluded (a=b sides equal?
    //   no — pair (ab,ab) has a == b, EXCLUDED by the a≠b rule);
    //   "a ab"→(a,ab) 2; "cd" stays → (c,d) 5 → (c,d)
    //   round 3: (a,ab) 2 → (a,ab)
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("aab") ++
      Seq.fill(5)("cd")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = BpeTrainer.train(docs, "text", rounds = 3)
    assert(rules === Seq(("a", "b"), ("c", "d"), ("a", "ab")))
  }

  test("training is deterministic across input layouts") {
    val docs = (0L until 60L).map(i =>
      (i, s"the quick brown fox number$i jumps over the lazy dog"))
      .toDF("id", "text")
    val r1 = BpeTrainer.train(docs, "text", rounds = 12)
    val r2 = BpeTrainer.train(docs.repartition(7), "text", rounds = 12)
    assert(r1 === r2)
    assert(r1.size === 12)
    assert(r1.forall { case (a, b) => a != b })
  }

  test("early stop: fewer repeated pairs than rounds") {
    val docs = Seq((0L, "ab")).toDF("id", "text")
    // one word, pairs (a,b) f=1 → merges to "ab"; then no pair remains
    val rules = BpeTrainer.train(docs, "text", rounds = 5)
    assert(rules === Seq(("a", "b")))
  }

  test("BpeSegmentWith encodes exactly like the driver-side encoder") {
    val rules = Seq(("t", "h"), ("th", "e"), ("e", "r"))
    val enc = new BpeEncoder(rules)
    val words = Seq("theretherethe", "other", "xyz", "t", "")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
      .withColumn("seg", BpeSegmentWith.bpe_segment_with(col("w"), rules))
    val got = df.select("w", "seg").as[(String, String)].collect().toMap
    words.foreach { w =>
      assert(got(w) === enc.segment(w).mkString(" "), s"word: $w")
    }
    // and the rules genuinely engage: t+h → th, th+e → the (the e is
    // then consumed, so (e,r) can no longer fire — greedy rank order)
    assert(got("other") === "o the r")
  }

  test("trained rules feed the encoder end to end (held-out tokens shrink)") {
    val docs = (0L until 40L).map(i =>
      (i, "the weather thermometer gathered feathers together")).toDF("id", "text")
    val rules = BpeTrainer.train(docs.filter(col("id") % 2 === 0), "text", 10)
    val toks = docs.filter(col("id") % 2 === 1)
      .select(explode(split(TextFunctions.normText(col("text")), " ")).as("w"))
      .withColumn("seg", BpeSegmentWith.bpe_segment_with(col("w"), rules))
      .agg(sum(size(split(col("seg"), " "))).cast("long"),
           sum(length(col("w"))).cast("long"))
      .as[(Long, Long)].head()
    // 10 merge rounds on a repetitive corpus must compress well below
    // character count
    assert(toks._1 < toks._2 / 2)
  }
}

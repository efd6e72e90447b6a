package graft

import org.apache.spark.sql.functions._
import graft.ops.RowOps

class RowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rowMode: majority wins, ties break to smallest value") {
    val df = Seq(
      (1.0, 1.0, 2.0), // majority 1
      (2.0, 2.0, 2.0), // unanimous
      (0.0, 1.0, 2.0), // all distinct → smallest
      (3.0, 1.0, 3.0)  // majority 3
    ).toDF("a", "b", "c")
    val got = df.select(RowOps.rowMode(Seq($"a", $"b", $"c")).as("m"))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 2.0, 0.0, 3.0))
  }

  test("weightedVote: np.bincount-argmax semantics") {
    val df = Seq(
      (0L, 1L, 1L), // l0 = 0.5, l1 = 0.3+0.2 = 0.5 exactly (IEEE) → tie → label 0
      (2L, 0L, 0L), // l2 = 0.5, l0 = 0.5 → tie → label 0
      (1L, 1L, 0L), // l1 = 0.8 wins
      (2L, 2L, 0L)  // l2 = 0.8 wins
    ).toDF("a", "b", "c")
    val got = df.select(RowOps.weightedVote(Seq($"a", $"b", $"c"), Seq(0.5, 0.3, 0.2)).as("v"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 2L))
  }

  test("weightedVote: all-zero weights fail fast instead of returning the first column") {
    val ex = intercept[IllegalArgumentException] {
      RowOps.weightedVote(Seq($"a", $"b"), Seq(0.0, 0.0))
    }
    assert(ex.getMessage.contains("positive"), ex.getMessage)
  }

  test("weightedMean normalizes weights") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val got = df.select(RowOps.weightedMean(Seq($"a", $"b", $"c"), Seq(2, 2, 2).map(_.toDouble)).as("m"))
      .as[Double].collect().head
    assert(math.abs(got - 2.0) < 1e-12)
  }

  test("rowMean with decimals=0 casts to long") {
    val df = Seq((1.0, 2.0, 3.1)).toDF("a", "b", "c")
    val schema = df.select(RowOps.rowMean(Seq($"a", $"b", $"c"), 0).as("m")).schema
    assert(schema.fields.head.dataType.typeName == "long")
  }
}

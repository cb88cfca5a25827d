package graft

import graft.operators.Merge
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "name", "bal")

  test("updates overwrite payload, deletes drop, untouched pass through") {
    val changes = Seq((2L, "U", 99.0), (3L, "D", 0.0)).toDF("id", "op", "bal")
    val got = Merge.applyChanges(base, changes, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)))
  }

  test("update of several payload columns applies all of them") {
    val changes = Seq((1L, "U", "z", 77.0)).toDF("id", "op", "name", "bal")
    val got = Merge.applyChanges(base, changes, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got.contains((1L, "z", 77.0)) && got.size == 4)
  }

  test("payload column absent from base throws") {
    val changes = Seq((1L, "U", 1.0)).toDF("id", "op", "not_a_col")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base, changes, "id")
    }
  }

  test("column order and names of the base are preserved") {
    val changes = Seq((2L, "U", 5.0)).toDF("id", "op", "bal")
    val out = Merge.applyChanges(base, changes, "id")
    assert(out.columns.toSeq == base.columns.toSeq)
  }

  test("schema colliding with internal working columns is rejected up front") {
    import org.apache.spark.sql.functions.lit
    val changes = Seq((2L, "U", 5.0)).toDF("id", "op", "bal")
    val ex = intercept[IllegalArgumentException] {
      Merge.applyChanges(base.withColumn("__op", lit("x")), changes, "id")
    }
    assert(ex.getMessage.contains("__op"))
    val ex2 = intercept[IllegalArgumentException] {
      Merge.applyChanges(base, changes.withColumn("__n_changes", lit(1)), "id")
    }
    assert(ex2.getMessage.contains("collide"))
  }

  test("multiple change rows for one key raise (MERGE single-match invariant)") {
    val changes = Seq((2L, "U", 99.0), (2L, "U", 50.0)).toDF("id", "op", "bal")
    val ex = intercept[Exception] {
      Merge.applyChanges(base, changes, "id").collect()
    }
    assert(ex.getMessage.contains("multiple change rows"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def synth(rows: Long, parts: Int = 8, seed: Long = 42L) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("generates exactly `rows` rows with dense distinct doc_ids") {
    val df = synth(1000)
    assert(df.count() == 1000)
    assert(df.agg(countDistinct(col("doc_id"))).head.getLong(0) == 1000)
    assert(df.agg(min("doc_id"), max("doc_id")).head == org.apache.spark.sql.Row(0L, 999L))
  }

  test("deterministic: same seed same table, different seed different text") {
    val a = synth(200).orderBy("doc_id").collect()
    val b = synth(200).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val c = synth(200, seed = 7L).orderBy("doc_id").collect()
    assert(!a.sameElements(c))
  }

  test("splits into the requested number of partitions") {
    assert(synth(1000, parts = 5).rdd.getNumPartitions == 5)
    // never more splits than rows
    assert(synth(3, parts = 8).count() == 3)
  }

  test("column pruning reaches the generator (ReadSchema shrinks)") {
    val pruned = synth(100).select("doc_id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("doc_id") && !plan.contains("text"))
    assert(pruned.count() == 100)
  }

  test("documents-shaped: text is a word bag, source in src0..src19") {
    val rows = synth(300).collect()
    assert(rows.forall(_.getString(1).split(" ").length >= 8))
    assert(rows.forall(r => r.getString(2).matches("src\\d{1,2}")))
  }
}

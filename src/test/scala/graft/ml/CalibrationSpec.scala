package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("a perfectly calibrated scorer sits on the diagonal in every bin") {
    // sq_err == var_pred row-for-row → per-bin realized == expected
    val scored = (0L until 1000L)
      .map(i => (i, 0.1 + (i % 50) / 100.0)).toDF("id", "v")
    val rel = Calibration.reliability(scored, col("v"), col("v"), col("id"),
        bins = 10)
      .collect()
    assert(rel.length == 10)
    assert(rel.map(_.getLong(1)).sum == 1000L)
    rel.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"bin ${r.getLong(0)}: expected ${r.getDouble(2)} vs realized ${r.getDouble(3)}")
    }
    // equi-depth: bins within one row of each other
    val ns = rel.map(_.getLong(1))
    assert(ns.max - ns.min <= 1)
  }

  test("an overconfident scorer shows realized error above predicted variance") {
    // true error is 4x the claimed variance everywhere
    val scored = (0L until 500L)
      .map(i => (i, 0.1 + (i % 20) / 100.0)).toDF("id", "v")
      .withColumn("e", col("v") * 4.0)
    val rel = Calibration.reliability(scored, col("v"), col("e"), col("id"),
      bins = 5).collect()
    rel.foreach(r => assert(r.getDouble(3) > r.getDouble(2) * 3.9,
      s"bin ${r.getLong(0)} not flagged as overconfident"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    // duplicate values force the tie-break column to matter
    (0 until 997).map(i => (i.toLong, rnd.nextInt(200).toDouble)).toDF("id", "v")
  }

  test("globalRowNumber equals the single-task global window") {
    val sort = Seq(desc("v"), col("id"))
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(sort: _*)).cast("long"))
    val viaRange = Ranking.globalRowNumber(df, sort, out = "rn", partitions = 8)
    val a = viaWindow.select("id", "rn").as[(Long, Long)].collect().toMap
    val b = viaRange.select("id", "rn").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("ntileFromRank reproduces SQL ntile remainder semantics") {
    // 997 rows, k=4 -> 250/249/249/249; also exercise n < k
    for ((rows, k) <- Seq((997, 4), (10, 4), (3, 4))) {
      val d = (1 to rows).map(_.toLong).toDF("r")
        .crossJoin(broadcast(Seq(rows.toLong).toDF("n")))
      val got = d.select(col("r"),
        Ranking.ntileFromRank(col("r"), col("n"), k).as("g"))
        .as[(Long, Long)].collect().toMap
      val exp = (1 to rows).map(_.toLong).toDF("r")
        .withColumn("g", ntile(k).over(Window.orderBy("r")).cast("long"))
        .as[(Long, Long)].collect().toMap
      assert(got == exp, s"rows=$rows k=$k")
    }
  }

  test("groupedRowNumber equals the window form; groups span partitions") {
    val rnd = new scala.util.Random(17)
    val df = (0 until 3000).map(i =>
        (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(50)))
      .toDF("id", "g", "v")
    val got = Ranking.groupedRowNumber(df, col("g"),
        Seq(col("v"), col("id")), partitions = 8)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v", "id")
    val exp = df.select(col("id"), row_number().over(w).cast("long").as("rn"))
      .as[(Long, Long)].collect().toMap
    assert(got == exp, "grouped rank diverged from the window form")
    // max rank per group == group size proves the offset chain covers every
    // range-partition slice of the group (each group spans several slices
    // at 3000 rows / 8 partitions / 3 groups)
    val maxRn = Ranking.groupedRowNumber(df, col("g"),
        Seq(col("v"), col("id")), partitions = 8)
      .groupBy("g").agg(max("rn").as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c")).count()
    assert(maxRn == 0, "per-group ranks don't cover 1..|group|")
  }
}

package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Misra-Gries heavy-hitters aggregate: the deterministic n/(k+1)
  * guarantee, estimate bounds, merge behavior across partitions, and
  * NULL handling.
  */
class HeavyHittersSpec extends SparkSuite {

  import spark.implicits._

  private def sketch(keys: Seq[String], k: Int, parts: Int = 4): Map[String, Long] =
    keys.toDF("k").repartition(parts)
      .agg(SketchFunctions.heavy_hitters(col("k"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .collect()
      .map { r =>
        val e = r.getStruct(0); e.getString(0) -> e.getLong(1)
      }.toMap

  test("every key above n/(k+1) survives, with est in [exact - n/(k+1), exact]") {
    // 100 a's, 60 b's, 20 c's, 20 d's; k=3 -> floor n/4 = 50: a,b guaranteed
    val keys = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++
      Seq.fill(20)("c") ++ Seq.fill(20)("d")
    val n = keys.length
    val s = sketch(scala.util.Random.shuffle(keys), 3)
    assert(s.contains("a") && s.contains("b"))
    assert(s.size <= 3)
    Seq("a" -> 100L, "b" -> 60L).foreach { case (ky, exact) =>
      val est = s(ky)
      assert(est <= exact && exact - est <= n / 4.0,
        s"$ky: est=$est exact=$exact")
    }
  }

  test("the guarantee holds under any partitioning (mergeable summaries)") {
    val keys = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i")
    Seq(1, 2, 8, 32).foreach { parts =>
      val s = sketch(scala.util.Random.shuffle(keys), 3, parts)
      assert(s.contains("hot"), s"parts=$parts lost the 40% key")
      assert(s("hot") <= 40 && 40 - s("hot") <= 100 / 4.0)
    }
  }

  test("NULL keys are ignored; an all-NULL input yields an empty sketch") {
    val s = Seq[Option[String]](None, Some("x"), None, Some("x"))
      .toDF("k")
      .agg(SketchFunctions.heavy_hitters(col("k"), 2).as("hh"))
      .select(size(col("hh")).as("sz"), col("hh"))
      .collect().head
    assert(s.getInt(0) == 1)
    val allNull = Seq[Option[String]](None, None).toDF("k")
      .agg(SketchFunctions.heavy_hitters(col("k"), 2).as("hh"))
      .select(size(col("hh"))).collect().head.getInt(0)
    assert(allNull == 0)
  }

  test("state never exceeds k pairs even over high-cardinality input") {
    val keys = (1 to 5000).map(i => s"k${i % 1000}")
    assert(sketch(keys, 5, 16).size <= 5)
  }

  test("a10 gate query: heavy hitters found with bounds on the fixture") {
    val rows = graft.operators.Monitoring.heavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty, "the fixture's 'en' share must clear n/(k+1)")
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"violated: $r")
    }
  }
}

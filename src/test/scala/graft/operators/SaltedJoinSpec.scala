package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SaltedJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of fact rows hit station "hot"
    val fact = (1 to 1000).map { i =>
      (if (i <= 900) "hot" else s"s${i % 7}", i.toLong)
    }.toDF("station_id", "reading_id")
    val dim = Seq(("hot", "umbria"), ("s1", "lazio"), ("s2", "toscana"),
      ("s3", "marche"), ("s4", "molise"), ("s5", "puglia"), ("s6", "sicilia"),
      ("s0", "veneto")).toDF("station_id", "region")

    val plain = fact.join(dim, "station_id")
      .select("station_id", "reading_id", "region")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SaltedJoin.saltedEquiJoin(fact, dim, "station_id", salts = 8)
      .select("station_id", "reading_id", "region")
      .collect().map(_.toSeq).sortBy(_.toString)

    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }
}

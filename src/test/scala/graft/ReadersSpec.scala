package graft

import java.nio.file.Files
import java.sql.Date
import graft.lake.{Catalog, Lake}
import graft.pipelines.Readers

/** Reader API: date-range filters, universe gating, null-gated variants
  * (utils/data.py semantics). */
class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lake = {
    val l = new Lake(spark, Files.createTempDirectory("readers_lake").toString)
    val d = (1 to 10).map(i => Date.valueOf(f"2024-03-$i%02d"))
    // universe: A always; B only first half
    val uni = d.flatMap(x => Seq((x, 2024, "A")) ++
      (if (x.before(Date.valueOf("2024-03-06"))) Seq((x, 2024, "B")) else Nil))
    l.create(Catalog.universe)
    l.append(Catalog.universe, uni.toDF("date", "year", "ticker"))
    // returns for A, B, and C (C not in universe)
    val rets = for (t <- Seq("A", "B", "C"); x <- d)
      yield (t, x, 2024, 0.01)
    l.create(Catalog.stockReturns)
    l.append(Catalog.stockReturns, rets.toDF("ticker", "date", "year", "return"))
    // alphas only for A, missing on some dates
    val alphas = d.take(3).map(x => ("A", x, 2024, "reversal", 0.5))
    l.create(Catalog.alphas)
    l.append(Catalog.alphas, alphas.toDF("ticker", "date", "year", "signal", "alpha"))
    l
  }

  private lazy val readers = new Readers(lake)

  test("universe gating keeps only point-in-time members") {
    val ur = readers.getUniverseReturns(
      Date.valueOf("2024-03-01"), Date.valueOf("2024-03-10")).collect()
    val byTicker = ur.groupBy(_.getAs[String]("ticker")).view.mapValues(_.length).toMap
    assert(byTicker == Map("A" -> 10, "B" -> 5)) // C excluded, B half-period
  }

  test("date-range filter applies") {
    val r = readers.getStockReturns(
      Date.valueOf("2024-03-03"), Date.valueOf("2024-03-04"))
    assert(r.count() == 3 * 2)
  }

  test("null-gated reader drops non-covered (date,ticker) cells") {
    val a = readers.getAlphas(
      Date.valueOf("2024-03-01"), Date.valueOf("2024-03-10")).collect()
    assert(a.length == 3) // A on 3 dates only; B/C have no alphas
    assert(a.forall(_.getAs[String]("ticker") == "A"))
  }
}

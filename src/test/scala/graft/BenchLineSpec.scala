package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record line is a driver-protocol surface: the driver captures
  * only the LAST 2000 chars of stdout and json-parses from that tail, so
  * the line must stay under budget WITH the opening brace intact for any
  * realistic query count. Round 3's record was lost to silent line growth
  * — this spec pins the contract without running Spark. */
class BenchLineSpec extends AnyFunSuite {

  private def mkResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q${i}%03d_some_operator_name" -> (i % 37) * 0.13)

  test("line stays inside the driver tail budget at any query count") {
    for (n <- Seq(1, 50, 95, 200, 500)) {
      val line = Bench.formatLine(mkResults(n),
        Seq(0.3, 0.3, 0.35, 0.08, 0.09), "/sf", 1400)
      // 1400-byte queries budget + fixed envelope leaves ample tail margin
      assert(line.length < 1700, s"n=$n line=${line.length}B")
      assert(line.startsWith("""{"metric":"total""""))
    }
  }

  test("line is valid JSON with the protocol fields") {
    val line = Bench.formatLine(
      Seq("a" -> 1.5, "b" -> 0.25, "c" -> 3.0),
      Seq(0.3, 0.31, 0.4, 0.08, 0.09), "/sf", 1400)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed \ "metric").extract[String] == "total")
    assert((parsed \ "value").extract[Double] == 4.75)
    assert((parsed \ "qn").extract[Int] == 3)
    assert((parsed \ "qdrop").extract[Int] == 0)
    assert((parsed \ "cal").extract[Seq[Double]] == Seq(0.3, 0.31, 0.4, 0.08, 0.09))
    assert((parsed \ "sf").extract[String] == "/sf")
  }

  test("queries emit slowest-first and the budget cut never reorders") {
    val results = (1 to 100).map(i => f"q$i%03d" -> i * 0.1)
    val line = Bench.formatLine(results, Seq(0.3, 0.3, 0.3, 0.1, 0.1), "/sf", 200)
    // the kept prefix must be the slowest entries, in descending order
    val kept = """"(q\d+)":([\d.]+)""".r
      .findAllMatchIn(line.substring(line.indexOf("\"queries\"")))
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    assert(kept.nonEmpty && kept.length < 100) // budget actually cut
    assert(kept.map(_._2) == kept.map(_._2).sorted.reverse)
    assert(kept.head._1 == "q100") // the slowest survived the cut
    // qdrop accounts for every dropped entry
    val dropped = """"qdrop":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    assert(kept.length + dropped == 100)
  }

  test("zero and single-query edges") {
    val empty = Bench.formatLine(Nil, Seq(0.3, 0.3, 0.3, 0.1, 0.1), "/sf", 1400)
    assert(empty.contains(""""qn":0""") && empty.contains(""""queries":{}"""))
    org.json4s.jackson.JsonMethods.parse(empty)
    val one = Bench.formatLine(Seq("only" -> 2.0), Seq(0.3, 0.3, 0.3, 0.1, 0.1), "/sf", 1400)
    assert(one.contains(""""queries":{"only":2.00}"""))
  }
}

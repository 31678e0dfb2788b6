package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record line is a driver-protocol surface: the driver captures
  * only the LAST 2000 chars of stdout and json-parses from that tail, so
  * the line must stay under budget WITH the opening brace intact for any
  * realistic query count. Round 3's record was lost to silent line growth
  * — this spec pins the contract without running Spark. Round 7 adds the
  * cpu digest (cput/cpudrop/cpuq) to the same line; cal is 6 entries
  * [st_pre, st_post, mt, io_pre, io_post, mem] since round 6. */
class BenchLineSpec extends AnyFunSuite {

  private val cal6 = Seq(0.3, 0.31, 0.4, 0.08, 0.09, 0.15)

  private def mkResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q${i}%03d_some_operator_name" -> (i % 37) * 0.13)

  /** cpu roughly tracks wall in the synthetic fixture */
  private def mkCpu(results: Seq[(String, Double)]): Seq[(String, Double)] =
    results.map { case (k, v) => k -> v * 6.4 }

  test("line stays inside the driver tail budget at any query count") {
    for (n <- Seq(1, 50, 95, 200, 500)) {
      val r = mkResults(n)
      val line = Bench.formatLine(r, mkCpu(r), cal6, "/sf", 1150)
      // 1150-byte queries budget + 400-byte cpu budget + fixed envelope
      // must leave the opening brace inside a 2000-char tail with margin
      assert(line.length < 1900, s"n=$n line=${line.length}B")
      assert(line.startsWith("""{"metric":"total""""))
    }
  }

  test("line is valid JSON with the protocol fields incl. cpu digest") {
    val r = Seq("a" -> 1.5, "b" -> 0.25, "c" -> 3.0)
    val line = Bench.formatLine(r,
      Seq("a" -> 9.6, "b" -> 1.6, "c" -> 19.2), cal6, "/sf", 1150)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed \ "metric").extract[String] == "total")
    assert((parsed \ "value").extract[Double] == 4.75)
    assert((parsed \ "qn").extract[Int] == 3)
    assert((parsed \ "qdrop").extract[Int] == 0)
    assert((parsed \ "cal").extract[Seq[Double]] == cal6)
    assert((parsed \ "sf").extract[String] == "/sf")
    // cput sums ALL queries' cpu; cpuq holds only wall ≥ 0.5 s entries
    assert((parsed \ "cput").extract[Double] == 30.4)
    // cputn = cput / mean(cal[0], cal[1]) = 30.4 / 0.305 ≈ 100, 0dp
    assert((parsed \ "cputn").extract[Double] == 100.0)
    assert((parsed \ "cpudrop").extract[Int] == 0)
    assert((parsed \ "cpuq" \ "c").extract[Double] == 19.2)
    assert((parsed \ "cpuq" \ "a").extract[Double] == 9.6)
    assert((parsed \ "cpuq" \ "b").toOption.isEmpty) // wall 0.25 < 0.5
  }

  test("queries emit slowest-first and the budget cut never reorders") {
    val results = (1 to 100).map(i => f"q$i%03d" -> i * 0.1)
    val line = Bench.formatLine(results, mkCpu(results), cal6, "/sf", 200)
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

  test("cpuq cut is slowest-wall-first with cpudrop accounting") {
    // 60 queries all ≥ 0.5 s wall → cpuq cannot fit them all in 200 bytes
    val results = (1 to 60).map(i => f"q$i%03d" -> (0.5 + i * 0.1))
    val line = Bench.formatLine(results, mkCpu(results), cal6, "/sf",
      1150, cpuBudget = 200)
    val cpuSect = line.substring(line.indexOf("\"cpuq\""), line.indexOf("\"queries\""))
    val kept = """"(q\d+)":([\d.]+)""".r.findAllMatchIn(cpuSect)
      .map(m => m.group(1)).toSeq
    assert(kept.nonEmpty && kept.length < 60)
    assert(kept.head == "q060") // slowest wall leads
    val cpuDrop = """"cpudrop":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    assert(kept.length + cpuDrop == 60)
  }

  test("zero and single-query edges") {
    val empty = Bench.formatLine(Nil, Nil, cal6, "/sf", 1150)
    assert(empty.contains(""""qn":0""") && empty.contains(""""queries":{}"""))
    assert(empty.contains(""""cpuq":{}"""))
    org.json4s.jackson.JsonMethods.parse(empty)
    val one = Bench.formatLine(Seq("only" -> 2.0), Seq("only" -> 12.8),
      cal6, "/sf", 1150)
    assert(one.contains(""""queries":{"only":2.00}"""))
    assert(one.contains(""""cpuq":{"only":12.8}"""))
  }
}

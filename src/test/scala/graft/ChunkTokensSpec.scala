package graft

import graft.functions.TextFunctions

/** Sliding-window token chunking: layout arithmetic, overlap, tails,
  * and degenerate inputs. */
class ChunkTokensSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, c: Int, s: Int): Seq[(Int, String, Int)] =
    TextFunctions.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", c, s)
      .orderBy($"chunk_no").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq

  test("overlapping chunks share (C - S) tokens and cover every token") {
    // 5 tokens, C=3, S=2: ceil((5-3)/2)+1 = 2 chunks at offsets 0 and 2
    assert(chunksOf("a b c d e", 3, 2) ==
      Seq((0, "a b c", 3), (1, "c d e", 3)))
    // 7 tokens, C=3, S=3 (disjoint): chunks at 0, 3, 6 — short tail kept
    assert(chunksOf("a b c d e f g", 3, 3) ==
      Seq((0, "a b c", 3), (1, "d e f", 3), (2, "g", 1)))
  }

  test("short and degenerate docs") {
    // n <= C: exactly one chunk, the whole doc
    assert(chunksOf("a b", 16, 12) == Seq((0, "a b", 2)))
    // zero tokens: no chunks
    assert(chunksOf("", 4, 2).isEmpty && chunksOf("   ", 4, 2).isEmpty)
    // boundary n == C: one chunk, not two
    assert(chunksOf("a b c", 3, 1) == Seq((0, "a b c", 3)))
  }

  test("layout matches the closed form across sizes") {
    for (n <- 1 to 40; (c, s) <- Seq((8, 8), (8, 5), (8, 1), (3, 2))) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val got = chunksOf(text, c, s)
      val expect = if (n <= c) 1 else (n - c + s - 1) / s + 1
      assert(got.size == expect, s"n=$n C=$c S=$s: ${got.size} != $expect")
      // chunk i starts at token i*s, never empty, ≤ C long
      got.foreach { case (i, ch, nt) =>
        val toks = ch.split(" ").toSeq
        assert(nt == toks.size && nt >= 1 && nt <= c)
        assert(toks.head == s"t${i * s + 1}", s"n=$n C=$c S=$s chunk $i")
      }
      // every token appears in some chunk
      val covered = got.flatMap(_._2.split(" ")).toSet
      assert(covered == (1 to n).map(i => s"t$i").toSet, s"n=$n C=$c S=$s")
    }
  }
}

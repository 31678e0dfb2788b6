package graft.functions

import org.apache.spark.sql.SparkSession

/** Staging/provenance tool for the x65 literal merge table (the StageQp
  * pattern): trains [[Bpe]] merges on the sf0.001 documents corpus and
  * prints them as (a) the Scala literal Seq for ExtraQueries and (b) the
  * DuckDB map() literal for the oracle SQL. The literals are pinned in
  * the contract (engine-portable oracle replay can't retrain), so re-run
  * this only if the corpus or trainer changes, and restage both sides.
  *
  * Usage: sbt "runMain graft.functions.StageBpe [numMerges] [sfDir]"
  */
object StageBpe {
  def main(args: Array[String]): Unit = {
    val numMerges = args.lift(0).map(_.toInt).getOrElse(48)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    println("[stagebpe] scala literal:")
    println(merges.map { case (a, b) => s"""("${esc(a)}", "${esc(b)}")""" }
      .mkString("  Seq(", ", ", ")"))
    println("[stagebpe] duckdb map keys (a || chr(1) || b):")
    println(merges.map { case (a, b) =>
        s"'${a.replace("'", "''")}' || chr(1) || '${b.replace("'", "''")}'" }
      .mkString("map([", ", ", "],"))
    println(s"[stagebpe] duckdb map values: [${merges.indices.mkString(", ")}])")
    spark.stop()
  }
}

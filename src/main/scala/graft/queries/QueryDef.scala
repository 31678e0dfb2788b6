package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark DataFrame builder over the testdata
  * dir plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
  * Column names and row ordering must match between the two exactly
  * (the driver sorts columns by name and hash-compares values).
  *
  * Float-determinism conventions used throughout the suite:
  *  - counts / min / max / integer-valued sums: exact, no rounding;
  *  - money-grid sums: exact via DecimalType routing (CoreOps.decimalSum);
  *  - row-local arithmetic on identical inputs (x*y, x/y-1): bitwise
  *    deterministic in both engines, no rounding;
  *  - genuinely irrational outputs (std, covar ratios, logs, EWM, cosine):
  *    rounded at a grid ≥ 1e6 × the FP reduction-order noise;
  *  - SIGN-ZERO: any rounded column whose value can be exactly zero gets
  *    `+ 0.0` appended ON BOTH SIDES after the round. DuckDB's ROUND
  *    preserves the sign of a tiny negative (→ -0.0) while Spark's
  *    BigDecimal round emits +0.0; the driver hash is bitwise, so a true
  *    zero reached from different directions fails (x23, rounds 3-4).
  *    IEEE `-0.0 + 0.0 = +0.0` normalizes both. Audit with
  *    tools/signzero_sweep.py; tools/selfcheck.py compares bitwise so the
  *    class can't hide locally.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Table loader. The events table stores TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read nanos as long and truncate to
    * microsecond timestamps — exactly what DuckDB does on the same file,
    * so oracle comparisons agree. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case (acc, _) => acc
    }
  }
}

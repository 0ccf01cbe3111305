package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, signum}

/** Cross-engine rounding. Spark's `round()` half-ups the shortest
  * DECIMAL representation of the double (BigDecimal.valueOf), while
  * DuckDB rounds the BINARY value half-away-from-zero — they disagree
  * whenever the shortest decimal repr lands exactly on a half
  * boundary: raw 0.72124999999999995 prints as "0.72125", Spark
  * rounds it to 0.7213, DuckDB to 0.7212 (observed: 5 of 5000
  * text_quality rows at sf0.1). `roundDuck` reproduces DuckDB's
  * semantics bit-for-bit: floor(|x|·10^s + 0.5) with the sign
  * restored — validated against DuckDB on half-boundary cases
  * including 0.00025 (binary-above-half → 0.0003) and large
  * magnitudes.
  */
object OracleMath {
  def roundDuck(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    signum(c) * (floor(abs(c) * p + 0.5d) / p)
  }
}

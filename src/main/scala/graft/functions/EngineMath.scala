package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-identical float math for oracle-compared results.
  *
  * Spark's `round()` converts the double to a BigDecimal (decimal string)
  * and applies HALF_UP — so a stored value of 54654.4812499999…, whose
  * decimal rendering is "54654.48125", rounds UP to .4813. DuckDB (and C
  * `std::round`) round the BINARY double half-away-from-zero: .4812. The
  * two disagree exactly at decimal-representation boundaries, which is
  * where rounded aggregate comparisons live.
  *
  * `roundAway` reproduces the binary-double semantics with plain double
  * arithmetic (`floor(|x|·10ⁿ + 0.5)` carries sign), making Spark output
  * bit-identical to DuckDB `round()` for all finite inputs in the
  * aggregate range (|x|·10ⁿ < 2⁵²). Nulls propagate.
  */
object EngineMath {
  def roundAway(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * p + lit(0.5)) / p)
  }
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The module-wide numeric conventions shared by every query module and
  * mirrored in the DuckDB oracles — defined once so a convention change
  * cannot drift between modules. */
private[queries] object QueryConventions {

  /** Exact, order-independent SUM of fractional doubles: go through
    * DECIMAL(18,6) so partial-aggregation order cannot perturb the result
    * (a raw double sum differs run-to-run across partitionings), then to
    * double rounded to cents. Oracle side:
    * `round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 2)`. */
  def decSum(c: Column): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double"), 2)
}

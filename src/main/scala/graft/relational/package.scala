package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

package object relational {
  /** Order-independent double sum: accumulate as DECIMAL(18,4) (exact,
    * associative) and cast back. Double addition is not associative, so
    * a plain sum's last bits depend on partition count; rounding can
    * then flip on .005 boundaries and break oracle parity. Every rounded
    * double sum in the catalog goes through this (SQL side mirrors it
    * with CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
}

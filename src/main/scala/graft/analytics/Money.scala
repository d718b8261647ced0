package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic shared by the relational queries.
  *
  * All monetary inputs carry exactly 2 decimals, but their products
  * (price × (1−disc) × (1+tax)) land on 4/6-decimal values whose
  * binary doubles sit exactly on round()'s half-way boundary — and
  * Spark (BigDecimal on the shortest decimal repr, HALF_UP) and
  * DuckDB (binary-value rounding) resolve those boundaries
  * differently. So: scale to exact integers (cents), aggregate in
  * longs (exact, associative, order-independent — also immune to
  * partial-aggregation reordering at 1000 executors), and divide once
  * at the end; the same integer divided by the same power of ten is
  * the same IEEE double in every engine.
  */
object Money {
  /** 2-decimal double → exact integer hundredths. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  val priceC: Column = cents(col("l_extendedprice"))
  val discC: Column = cents(col("l_discount"))
  val taxC: Column = cents(col("l_tax"))

  /** extendedprice × (1 − discount), exact in 1e-4 units. */
  val netE4: Column = priceC * (lit(100L) - discC)

  /** netE4 × (1 + tax), exact in 1e-6 units. */
  val chargeE6: Column = netE4 * (lit(100L) + taxC)

  /** price × discount, exact in 1e-4 units (Q6 revenue). */
  val discRevenueE4: Column = priceC * discC

  /** Exact integer sum → dollars-as-double (one IEEE division). */
  def dollars(sumCol: Column, scale: Double): Column =
    sumCol.cast("double") / lit(scale)
}

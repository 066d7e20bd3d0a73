"""Classic relational analytics — the general join/agg surface.

The reference has no general joins or group-bys (SURVEY.md §2.9: its only
join-shaped patterns are the dedup hash-membership ones); this module proves
the engine's relational completeness on the TPC-H-shaped side tables with
three canonical query shapes:

- pricing_summary     Q1 shape: scan-filter -> partial+final agg. All money
                      math in DECIMAL so results are exact and independent
                      of aggregation order (float64 sums would differ
                      between Spark's partial-agg order and the oracle's).
- top_revenue_orders  Q3 shape: small-dim broadcast (filtered customer) ->
                      shuffle join orders⨝lineitem on the orderkey -> agg ->
                      deterministic top-k.
- region_revenue      Q5 shape: star join; every dimension (region, nation,
                      supplier, customer) broadcasts, the fact table never
                      shuffles until the final small agg.

Scale notes: Q1 is one shuffle of ~|groups| rows after map-side combine;
Q3's only large exchange is orders⨝lineitem on their shared key (AQE
handles skewed orderkeys); Q5 keeps the lineitem scan pipeline-local by
broadcasting every dimension — `F.broadcast` hints make the intent explicit
rather than relying on the 64 MB auto threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME = "relational"

_DEC = "decimal(18,6)"


def _d(col: str):
    return F.col(col).cast(_DEC)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    # Each intermediate is re-cast to DECIMAL(18,6): price/discount/tax carry
    # <=2 dp so the products are exact at scale <=6 — the cast is lossless and
    # pins the scale that Spark and DuckDB would otherwise reduce differently
    # on precision overflow (observed 1e-9-relative drift in sum_charge).
    disc_price = (_d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))).cast(_DEC)
    charge = (disc_price * (F.lit(1).cast(_DEC) + _d("l_tax"))).cast(_DEC)
    agg = (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).alias("sum_qty"),
            F.sum(_d("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )
    # money math stays DECIMAL through the aggregation (exact, order-independent);
    # the final projection renders DOUBLE so the Spark and DuckDB results carry
    # identical pandas dtypes under the driver's frame compare (Decimal cells
    # hash differently from float64 even at equal value)
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_price").cast("double") / F.col("count_order"), 6).alias("avg_price"),
        "count_order",
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < date)
    li = lineitem.filter(F.col("l_shipdate") > date)
    revenue = (_d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))).cast(_DEC)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(cust), o.o_custkey == cust.c_custkey
    )
    # exact DECIMAL sum, rendered DOUBLE before the order/limit so the top-k
    # tie-break (revenue DESC, orderkey ASC) is evaluated over the same values
    # the oracle orders by
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def region_revenue(
    spark_tables: dict[str, DataFrame], region_name: str = "ASIA", year: int = 1996
) -> DataFrame:
    """Revenue per nation for suppliers and customers in the same nation of
    one region — the Q5 star-join shape."""
    t = spark_tables
    revenue = (_d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))).cast(_DEC)
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    joined = (
        t["lineitem"]
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("o_orderdate") == year)
        .join(
            F.broadcast(t["customer"]),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


# --- DuckDB oracles ----------------------------------------------------------

_SQL_DISC = (
    "(l_extendedprice::DECIMAL(18,6) * "
    "(1::DECIMAL(18,6) - l_discount::DECIMAL(18,6)))::DECIMAL(18,6)"
)


def oracle_sql_pricing_summary(cutoff: str = "1998-09-02") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(18,6))::DOUBLE AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,6))::DOUBLE AS sum_base_price,
  sum({_SQL_DISC})::DOUBLE AS sum_disc_price,
  sum(({_SQL_DISC} * (1::DECIMAL(18,6) + l_tax::DECIMAL(18,6)))::DECIMAL(18,6))::DOUBLE AS sum_charge,
  round(sum(l_quantity::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_qty,
  round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY 1, 2
""".strip()


def oracle_sql_top_revenue_orders(
    segment: str = "BUILDING", date: str = "1998-03-15", k: int = 10
) -> str:
    return f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum({_SQL_DISC})::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date} 00:00:00'
  AND l_shipdate > TIMESTAMP '{date} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {k}
""".strip()


def oracle_sql_region_revenue(region_name: str = "ASIA", year: int = 1996) -> str:
    return f"""
SELECT n_name, sum({_SQL_DISC})::DOUBLE AS revenue, count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
WHERE r_name = '{region_name}' AND year(o_orderdate) = {year}
GROUP BY 1
""".strip()

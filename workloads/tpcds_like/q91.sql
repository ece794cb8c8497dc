-- Time-range window frame: per-priority revenue over a trailing 7-day
-- RANGE frame keyed on the order timestamp (RANGE BETWEEN INTERVAL —
-- a frame ROWS cannot express under ties).
SELECT o_orderpriority, o_orderdate, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS rev_7d
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY o_orderpriority, o_orderdate, o_orderkey

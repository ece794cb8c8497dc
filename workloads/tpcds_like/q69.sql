-- TPC-DS q53/q63 shape: per-manufacturer quarterly revenue compared to
-- its own all-quarter average (window over aggregate), emitting the
-- quarters deviating by more than 10%. The all-quarter average is a
-- window SUM over the EXACT decimal divided by a window COUNT (both
-- order-independent) — a double AVG() window would be
-- FP-order-dependent and engine-divergent.
WITH q AS (
  SELECT p_type, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qtr,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, EXTRACT(YEAR FROM l_shipdate),
           EXTRACT(QUARTER FROM l_shipdate))
SELECT p_type, yr, qtr, rev, avg_rev
FROM (
  SELECT p_type, yr, qtr,
         CAST(rev_dec AS DOUBLE) AS rev,
         CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY p_type) AS avg_rev
  FROM q)
WHERE avg_rev > 0 AND ABS(rev - avg_rev) / avg_rev > 0.1
ORDER BY p_type, yr, qtr

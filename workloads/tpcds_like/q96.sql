-- first_value / nth_value probes over a named WINDOW: each brand's
-- best and second-best month by revenue attached to every row of its
-- monthly series.
WITH m AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate),
           EXTRACT(MONTH FROM l_shipdate))
SELECT p_brand, yr, mon, rev,
       FIRST_VALUE(rev) OVER w AS best_rev,
       NTH_VALUE(rev, 2) OVER w AS second_rev
FROM m
WINDOW w AS (PARTITION BY p_brand ORDER BY rev DESC, yr, mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY p_brand, yr, mon

-- TPC-DS q65 shape: min-average screen — suppliers whose revenue for
-- some part is at most 50% of that part's average supplier revenue;
-- aggregate-of-aggregate via a joined subquery.
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem
  GROUP BY l_suppkey, l_partkey),
avg_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_rev
  FROM sp
  GROUP BY l_partkey)
SELECT s_name, p_name, sp.rev, ap.avg_rev
FROM sp
JOIN avg_part ap ON sp.l_partkey = ap.l_partkey
JOIN supplier ON sp.l_suppkey = s_suppkey
JOIN part ON sp.l_partkey = p_partkey
WHERE sp.rev <= 0.5 * ap.avg_rev
ORDER BY s_name, p_name, sp.l_suppkey, sp.l_partkey
LIMIT 100

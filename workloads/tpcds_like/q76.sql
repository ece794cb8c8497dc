-- TPC-DS q77 shape: gross / returns / net per nation with a GROUPING
-- SETS grand-total row — sales and returns aggregated separately, FULL
-- OUTER JOINed, then rolled up.
WITH sales AS (
  SELECT c_nationkey AS nat,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS gross
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag <> 'R' GROUP BY c_nationkey),
rets AS (
  SELECT c_nationkey AS nat,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS returned
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R' GROUP BY c_nationkey)
SELECT nat, CAST(GROUPING(nat) AS BIGINT) AS is_total,
       CAST(SUM(CAST(gross AS DECIMAL(18,6))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(returned AS DECIMAL(18,6))) AS DOUBLE) AS returned,
       CAST(SUM(CAST(gross - returned AS DECIMAL(18,6))) AS DOUBLE) AS net
FROM (
  SELECT CAST(COALESCE(s.nat, r.nat) AS BIGINT) AS nat,
         COALESCE(s.gross, 0) AS gross,
         COALESCE(r.returned, 0) AS returned
  FROM sales s FULL OUTER JOIN rets r ON s.nat = r.nat)
GROUP BY GROUPING SETS ((nat), ())
ORDER BY is_total, nat

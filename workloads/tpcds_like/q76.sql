-- TPC-DS q77 shape: gross / returns / net per nation with a GROUPING
-- SETS grand-total row. Single fact pass: gross and returns are
-- conditional aggregates over ONE lineitem⋈orders⋈customer scan (the
-- r4 twin-CTE FULL OUTER form paid the 3-way fact join twice for two
-- branches differing only in the l_returnflag predicate — 2× the join
-- work with no exchange reuse possible). Every lineitem row carries a
-- non-null l_returnflag, so the per-nation row set is identical to the
-- FULL OUTER of the two filtered branches; the IS NOT NULL guard pins
-- that equivalence exactly.
WITH per_nat AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nat,
         CAST(SUM(CASE WHEN l_returnflag <> 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS gross,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS returned
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag IS NOT NULL
  GROUP BY c_nationkey)
SELECT nat, CAST(GROUPING(nat) AS BIGINT) AS is_total,
       CAST(SUM(CAST(gross AS DECIMAL(18,6))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(returned AS DECIMAL(18,6))) AS DOUBLE) AS returned,
       CAST(SUM(CAST(gross - returned AS DECIMAL(18,6))) AS DOUBLE) AS net
FROM per_nat
GROUP BY GROUPING SETS ((nat), ())
ORDER BY is_total, nat

-- TPC-DS q10 shape: cohort counting gated by EXISTS across channels —
-- customers with a 1996-1997 order AND activity in either the
-- returned-line or urgent-order "channel" (the OR folded into one
-- EXISTS over a UNION ALL, the decorrelation-friendly form).
SELECT c_mktsegment, COUNT(*) AS cnt
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997))
  AND EXISTS (
    SELECT 1 FROM (
      SELECT o_custkey AS k FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') u
    WHERE u.k = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment

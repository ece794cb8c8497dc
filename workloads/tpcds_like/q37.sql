-- TPC-DS q93 shape: return-adjusted customer spend — every sale line
-- offset by its R-flag twin quantity (LEFT JOIN, COALESCE), summed per
-- customer, top spenders.
SELECT o_custkey,
       CAST(SUM(CAST((s.l_quantity - COALESCE(r.l_quantity, 0))
                * s.l_extendedprice / s.l_quantity
                AS DECIMAL(18,6))) AS DOUBLE) AS net_spend
FROM lineitem s
LEFT JOIN lineitem r
  ON r.l_orderkey = s.l_orderkey AND r.l_partkey = s.l_partkey
 AND r.l_linenumber <> s.l_linenumber AND r.l_returnflag = 'R'
JOIN orders ON s.l_orderkey = o_orderkey
WHERE s.l_returnflag = 'N'
GROUP BY o_custkey
ORDER BY net_spend DESC, o_custkey
LIMIT 100

-- Anti-join screen: parts with NO returned line in June 1997 (a
-- correlated NOT EXISTS the planner turns into a left-anti join)
-- joined back for their same-month revenue.
SELECT p_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS rev_jun97
FROM lineitem JOIN part p ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1997-06-01' AND l_shipdate < DATE '1997-07-01'
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey AND l2.l_returnflag = 'R'
      AND l2.l_shipdate >= DATE '1997-06-01'
      AND l2.l_shipdate < DATE '1997-07-01')
GROUP BY p_name
ORDER BY p_name

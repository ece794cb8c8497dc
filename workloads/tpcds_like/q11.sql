-- TPC-DS q17 shape: correlated per-group average threshold — lineitem
-- rows whose quantity is under 20% of their part's average quantity,
-- priced per supplier nation. Catalyst decorrelates the per-part
-- average into an aggregate + equi-join.
SELECT sn.n_name AS supp_nation, COUNT(*) AS n_cheap,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS cheap_revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE l.l_quantity < (
  SELECT 0.4 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*))
  FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
GROUP BY sn.n_name
ORDER BY supp_nation

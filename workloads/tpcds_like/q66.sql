-- TPC-DS q30 shape: customers returning more than 1.2x their nation's
-- average return total, emitted with full customer detail (the q1
-- family with a detailed projection and per-nation correlation).
WITH ctr AS (
  SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS total_ret
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, c_nationkey)
SELECT c_custkey, c_name, c_acctbal, c_mktsegment, total_ret
FROM ctr ctr1 JOIN customer ON ctr1.ctr_cust = c_custkey
WHERE total_ret > (SELECT AVG(total_ret) * 1.2 FROM ctr ctr2
                   WHERE ctr2.ctr_nation = ctr1.ctr_nation)
ORDER BY c_custkey

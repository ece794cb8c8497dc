-- TPC-DS q81 shape: the q30 pattern on the supplier axis — suppliers
-- whose returned value exceeds 1.01x their REGION's average (region,
-- not nation: the fixture has 10 suppliers over 25 nations, so the
-- state-level correlation of the original is lifted one level).
WITH sret AS (
  SELECT l_suppkey AS sk, r_regionkey AS reg,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS ret
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE l_returnflag = 'R'
  GROUP BY l_suppkey, r_regionkey)
SELECT s_name, s_acctbal, ret
FROM sret s1 JOIN supplier ON s1.sk = s_suppkey
WHERE ret > (SELECT AVG(ret) * 1.01 FROM sret s2 WHERE s2.reg = s1.reg)
ORDER BY s_name

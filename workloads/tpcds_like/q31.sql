-- TPC-DS q11/q4 shape: segments whose spend grew faster in one channel
-- than another across two years — two channel CTEs × two years, 4-way
-- join on segment, ratio comparison with zero guards.
WITH yearly AS (
  SELECT c_mktsegment AS seg, o_orderstatus AS chan,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus IN ('F', 'O')
    AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
  GROUP BY c_mktsegment, o_orderstatus, EXTRACT(YEAR FROM o_orderdate))
SELECT f1.seg,
       f2.spend / f1.spend AS f_growth,
       o2.spend / o1.spend AS o_growth
FROM yearly f1
JOIN yearly f2 ON f1.seg = f2.seg
  AND f1.chan = 'F' AND f2.chan = 'F' AND f1.yr = 1996 AND f2.yr = 1997
JOIN yearly o1 ON f1.seg = o1.seg AND o1.chan = 'O' AND o1.yr = 1996
JOIN yearly o2 ON f1.seg = o2.seg AND o2.chan = 'O' AND o2.yr = 1997
WHERE f1.spend > 0 AND o1.spend > 0
  AND o2.spend / o1.spend <> f2.spend / f1.spend
ORDER BY o2.spend / o1.spend - f2.spend / f1.spend DESC, f1.seg

-- TPC-DS q91 shape: monthly returned-value loss attributed through
-- customer "demographic" bands (segment x balance sign) — a narrow
-- group over a three-way join.
SELECT c_mktsegment,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'funded' END AS band,
       CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS loss
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1997
GROUP BY c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'funded' END,
         EXTRACT(MONTH FROM l_shipdate)
ORDER BY c_mktsegment, band, mon

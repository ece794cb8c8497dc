-- TPC-DS q7 shape: per-item average statistics under "demographic"
-- filters — avg quantity / price / discount per part name for
-- BUILDING-segment customers on non-urgent orders.
SELECT p_name,
       CAST(AVG(l_quantity) AS DOUBLE) AS avg_qty,
       CAST(AVG(l_extendedprice) AS DOUBLE) AS avg_price,
       CAST(AVG(l_discount) AS DOUBLE) AS avg_disc
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
WHERE c_mktsegment = 'BUILDING' AND o_orderpriority <> '1-URGENT'
GROUP BY p_name
ORDER BY p_name

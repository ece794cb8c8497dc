-- TPC-DS q26 shape: the catalog twin of the q7 average probe —
-- averages per brand for finished, low-priority orders.
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_tax) AS avg_tax
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE o_orderstatus = 'F'
  AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
GROUP BY p_brand
ORDER BY p_brand

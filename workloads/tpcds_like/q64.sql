-- TPC-DS q26 shape: the catalog twin of the q7 average probe —
-- averages per brand for finished, low-priority orders.
SELECT p_brand,
       CAST(AVG(l_quantity) AS DOUBLE) AS avg_qty,
       CAST(AVG(l_extendedprice) AS DOUBLE) AS avg_price,
       CAST(AVG(l_tax) AS DOUBLE) AS avg_tax
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE o_orderstatus = 'F'
  AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
GROUP BY p_brand
ORDER BY p_brand

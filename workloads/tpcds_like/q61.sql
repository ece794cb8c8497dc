-- TPC-DS q19 shape: brand revenue where the buyer and the supplier sit
-- in different nations (the customer-zip vs store-zip mismatch) over a
-- part-size band.
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
WHERE c_nationkey <> s_nationkey AND p_size <= 25
GROUP BY p_brand
ORDER BY rev DESC, p_brand

-- TPC-DS q45 shape: geography-OR-membership customer revenue — nation
-- in a list OR the customer bought a specific part set (IN-subquery on
-- an attribute-screened part list), grouped per nation.
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('CANADA', 'BRAZIL', 'CHINA')
   OR o_custkey IN (
     SELECT o2.o_custkey FROM orders o2
     JOIN lineitem ON l_orderkey = o2.o_orderkey
     JOIN part ON l_partkey = p_partkey
     WHERE p_size = 1)
GROUP BY n_name
ORDER BY n_name

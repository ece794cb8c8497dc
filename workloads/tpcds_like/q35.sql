-- TPC-DS q6 shape: rows priced above 1.2× their category average —
-- correlated average by part type + month filter + HAVING count
-- threshold on the aggregating key.
SELECT n_name, COUNT(*) AS cnt
FROM lineitem
JOIN part p1 ON l_partkey = p1.p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE EXTRACT(MONTH FROM l_shipdate) = 3
  AND p1.p_retailprice > 1.005 * (
    SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*)
    FROM part p2 WHERE p2.p_type = p1.p_type)
GROUP BY n_name
HAVING COUNT(*) >= 2
ORDER BY cnt, n_name

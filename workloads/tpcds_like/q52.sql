-- TPC-DS q37/q82 shape: part screen over a price band + date-window
-- availability, restricted to parts some supplier actually shipped in
-- the window (IN-subquery), distinct projection.
SELECT DISTINCT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice BETWEEN 902 AND 910
  AND p_partkey IN (
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate BETWEEN CAST('1996-06-01' AS DATE)
                         AND CAST('1996-08-31' AS DATE))
ORDER BY p_partkey
LIMIT 100

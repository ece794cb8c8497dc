-- NOT IN with its three-valued-logic footgun handled: parts never
-- shipped by region-0 suppliers during 1998 H2, via a NULL-guarded
-- NOT IN subquery (plans as null-aware anti join).
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 0 AND l_partkey IS NOT NULL
    AND l_shipdate >= DATE '1998-07-01')
ORDER BY p_partkey

-- TPC-DS q8 shape: revenue restricted to "preferred" geographies — the
-- supplier's nation must appear BOTH among nations with at least five
-- customers and among nations holding high-balance customers (the
-- zip-list INTERSECT of q8's substr(ca_zip) trick).
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_nationkey IN (
  SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 5
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_acctbal > 1000
  GROUP BY c_nationkey)
GROUP BY n_name
ORDER BY n_name

-- TPC-DS q84 shape: a pure lookup — customers in a low-key region band
-- with balance in range, emitted as a formatted "nation: name" concat,
-- no aggregate at all (projection + two broadcast joins + top-k).
SELECT c_custkey, CONCAT(n_name, ': ', c_name) AS customer_id, c_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal BETWEEN 2000 AND 8000 AND n_regionkey <= 2
ORDER BY c_custkey
LIMIT 100

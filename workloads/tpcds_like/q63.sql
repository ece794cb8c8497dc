-- TPC-DS q24 shape: per-(customer, nation) returned-value totals kept
-- only above a fraction of the average such total — the scalar
-- subquery over the SAME CTE it filters (multi-ref CTE).
WITH per_cust AS (
  SELECT c_custkey, n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS ret_val
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, n_name)
SELECT c_custkey, n_name, ret_val
FROM per_cust
WHERE ret_val > (SELECT 1.05 * AVG(ret_val) FROM per_cust)
ORDER BY ret_val DESC, c_custkey

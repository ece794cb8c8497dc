-- TPC-DS q1 shape on the TPC-H-ish fixtures: CTE aggregate + correlated
-- scalar subquery (decorrelated by Catalyst) + dim joins + top-k.
WITH customer_total_return AS (
  SELECT o_custkey AS ctr_customer_sk,
         l_suppkey AS ctr_store_sk,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS ctr_total_return
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, l_suppkey)
SELECT c_name, ctr_customer_sk, ctr_store_sk, ctr_total_return
FROM customer_total_return ctr1
JOIN customer ON ctr1.ctr_customer_sk = c_custkey
WHERE ctr_total_return > (
  SELECT CAST(SUM(CAST(ctr_total_return AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) * 1.2
  FROM customer_total_return ctr2
  WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
ORDER BY c_name, ctr_customer_sk, ctr_store_sk
LIMIT 100

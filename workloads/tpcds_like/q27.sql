-- TPC-DS q35 shape: multi-conditional statistics per group — count,
-- sum, avg, max, min computed over the same frame with different
-- conditional populations, demographic-style grouping.
SELECT c_mktsegment,
       n_name,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_finished,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment, n_name
ORDER BY c_mktsegment, n_name

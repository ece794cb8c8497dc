-- TPC-DS q15 shape: geography CASE OR high-value filter — quarterly
-- revenue per nation where the nation is in a target list OR the order
-- is individually large.
SELECT n_name,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('FRANCE', 'GERMANY', 'JAPAN')
   OR o_totalprice > 400000
GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate)
ORDER BY n_name, qtr

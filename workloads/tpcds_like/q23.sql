-- TPC-DS q66 shape: wide CASE pivot — monthly revenue spread into 12
-- conditional-sum columns per (nation, year), one scan, no joins in
-- the pivot itself.
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 1  THEN o_totalprice ELSE 0 END) AS jan_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 2  THEN o_totalprice ELSE 0 END) AS feb_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 3  THEN o_totalprice ELSE 0 END) AS mar_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 4  THEN o_totalprice ELSE 0 END) AS apr_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 5  THEN o_totalprice ELSE 0 END) AS may_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 6  THEN o_totalprice ELSE 0 END) AS jun_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 7  THEN o_totalprice ELSE 0 END) AS jul_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 8  THEN o_totalprice ELSE 0 END) AS aug_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 9  THEN o_totalprice ELSE 0 END) AS sep_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 10 THEN o_totalprice ELSE 0 END) AS oct_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 11 THEN o_totalprice ELSE 0 END) AS nov_sales,
       SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 12 THEN o_totalprice ELSE 0 END) AS dec_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY n_name, yr

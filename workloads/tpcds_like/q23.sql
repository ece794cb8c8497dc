-- TPC-DS q66 shape: wide CASE pivot — monthly revenue spread into 12
-- conditional-sum columns per (nation, year), one scan, no joins in
-- the pivot itself. Sales are summed as DECIMAL(18,6) (exact,
-- order-independent) and cast to DOUBLE only at the output edge.
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 1 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS jan_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 2 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS feb_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 3 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS mar_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 4 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS apr_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 5 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS may_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 6 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS jun_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 7 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS jul_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 8 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS aug_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 9 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sep_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 10 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS oct_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 11 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nov_sales,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = 12 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS dec_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY n_name, yr

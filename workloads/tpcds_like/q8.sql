-- TPC-DS q64 shape (queries/q64.sql): a wide star — fact joined to
-- customer-side nation/region, supplier-side nation/region, and part
-- (9 tables), aggregated per (customer, brand, year), then SELF-JOINED
-- on consecutive years keeping pairs whose revenue grew. Exercises
-- join reorder, repeated dim broadcasts, and exchange reuse: the year
-- step is a cross-side filter (not an equi-key) and cust_region is
-- re-attached AFTER the self-join, so both join arms are the SAME
-- aggregate hashed on the same keys — Spark computes the 9-table
-- aggregate once and reuses the exchange for the other arm.
WITH sales AS (
  SELECT c_custkey AS custkey, cn.n_name AS cust_nation,
         sn.n_name AS supp_nation,
         p_brand AS brand,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS sale_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
           AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
  JOIN part     ON l_partkey = p_partkey
  GROUP BY c_custkey, cn.n_name, sn.n_name, p_brand,
           EXTRACT(YEAR FROM o_orderdate))
SELECT s1.custkey, s1.cust_nation, rr.r_name AS cust_region,
       s1.supp_nation,
       s1.brand, s1.sale_year AS year1, s2.sale_year AS year2,
       s1.revenue AS rev1, s2.revenue AS rev2
FROM sales s1
JOIN sales s2
  ON s1.custkey = s2.custkey AND s1.brand = s2.brand
 AND s1.cust_nation = s2.cust_nation AND s1.supp_nation = s2.supp_nation
 AND s2.sale_year - s1.sale_year = 1
JOIN nation nn ON s1.cust_nation = nn.n_name
JOIN region rr ON nn.n_regionkey = rr.r_regionkey
WHERE s2.revenue > s1.revenue
ORDER BY s1.custkey, s1.brand, s1.cust_nation, s1.supp_nation,
         s1.sale_year, s2.sale_year
LIMIT 100

-- TPC-DS q54 shape: cohort expansion across a following window — the
-- customers who bought a target part-type, then their TOTAL spend in
-- the following two months, bucketed into spend bands.
WITH cohort AS (
  SELECT DISTINCT o_custkey AS custkey, o_orderdate AS first_buy
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type LIKE '%PROMO%'
    AND o_orderdate BETWEEN CAST('1996-03-01' AS DATE)
                        AND CAST('1996-03-31' AS DATE)),
follow AS (
  SELECT c.custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
  FROM cohort c
  JOIN orders o ON o.o_custkey = c.custkey
   AND o.o_orderdate > c.first_buy
   AND o.o_orderdate <= c.first_buy + INTERVAL '60' DAY
  GROUP BY c.custkey)
SELECT CAST(FLOOR(spend / 50000) AS BIGINT) AS spend_band,
       COUNT(*) AS n_customers
FROM follow
GROUP BY FLOOR(spend / 50000)
ORDER BY spend_band

-- TPC-DS q79 shape: each customer's single largest 1997 order with a
-- name-derived display column (substr) — ROW_NUMBER pick of the
-- per-(customer, year) maximum.
SELECT c_custkey, SUBSTR(c_name, 10, 9) AS cust_tag, o_orderkey,
       o_totalprice
FROM (
  SELECT c_custkey, c_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c_custkey, EXTRACT(YEAR FROM o_orderdate)
           ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rn = 1 AND yr = 1997
ORDER BY c_custkey

-- TPC-DS q97 shape: channel-overlap matrix — FULL OUTER JOIN of two
-- channel cohorts on customer, counting exclusive and shared members
-- with conditional sums over null-ness.
WITH f_cust AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
o_cust AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
-- COUNT(CASE...) not SUM: DuckDB SUM(int) widens to HUGEINT (reads
-- back as float), COUNT stays BIGINT in both engines
SELECT COUNT(CASE WHEN f.custkey IS NOT NULL AND o.custkey IS NULL
                  THEN 1 END) AS f_only,
       COUNT(CASE WHEN f.custkey IS NULL AND o.custkey IS NOT NULL
                  THEN 1 END) AS o_only,
       COUNT(CASE WHEN f.custkey IS NOT NULL AND o.custkey IS NOT NULL
                  THEN 1 END) AS both_channels
FROM f_cust f
FULL OUTER JOIN o_cust o ON f.custkey = o.custkey

-- TPC-DS q9 shape (queries/q9.sql): a CASE-on-scalar-subqueries stack —
-- five quantity buckets, each choosing between two aggregates by a
-- count threshold, projected from a one-row dim scan. Exercises
-- repeated uncorrelated scalar-subquery planning + subquery reuse.
-- Decimal-exact sums so the same text is its own DuckDB oracle.
SELECT
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 1100
    THEN CAST((SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS DOUBLE)
    ELSE CAST((SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS DOUBLE) END AS bucket1,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 1100
    THEN CAST((SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS DOUBLE)
    ELSE CAST((SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS DOUBLE) END AS bucket2,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 1100
    THEN CAST((SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS DOUBLE)
    ELSE CAST((SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS DOUBLE) END AS bucket3,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 1100
    THEN CAST((SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS DOUBLE)
    ELSE CAST((SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS DOUBLE) END AS bucket4,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 1100
    THEN CAST((SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS DOUBLE)
    ELSE CAST((SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS DOUBLE) END AS bucket5
FROM region
WHERE r_regionkey = 1

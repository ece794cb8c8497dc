-- TPC-DS q43 shape: day-of-week pivot — per customer nation, order
-- revenue spread across the week via CASE-summed columns
-- (EXTRACT(DOW), Sunday-first).
SELECT n_name,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 1
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS sun_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 2
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS mon_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 3
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS tue_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 4
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS wed_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 5
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS thu_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 6
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS fri_rev,
  CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) = 7
    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS sat_rev
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name

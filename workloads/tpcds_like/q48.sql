-- TPC-DS q96 shape: a pinpoint count — one narrow slice (priority,
-- quantity band, date window) counted; the pattern TPC-DS uses to
-- probe index-less selective scans.
SELECT COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '2-HIGH'
  AND l_quantity BETWEEN 20 AND 25
  AND l_shipdate BETWEEN CAST('1997-04-01' AS DATE)
                     AND CAST('1997-04-30' AS DATE)

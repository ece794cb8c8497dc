-- TPC-DS q31 shape: per-(nation, quarter) sales self-joined across
-- consecutive quarters, keeping nations whose web-ish growth outpaces
-- store-ish growth — two CTE frames, four self-join arms.
WITH nq AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
         o_orderstatus AS status,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sales
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderstatus IN ('F', 'O')
  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
           EXTRACT(QUARTER FROM o_orderdate), o_orderstatus)
SELECT f1.n_name, f1.yr, f1.qtr AS q1, f2.qtr AS q2,
       f2.sales / f1.sales AS f_growth,
       o2.sales / o1.sales AS o_growth
FROM nq f1
JOIN nq f2 ON f1.n_name = f2.n_name AND f1.yr = f2.yr
          AND f2.qtr = f1.qtr + 1 AND f1.status = 'F' AND f2.status = 'F'
JOIN nq o1 ON f1.n_name = o1.n_name AND f1.yr = o1.yr
          AND o1.qtr = f1.qtr AND o1.status = 'O'
JOIN nq o2 ON f1.n_name = o2.n_name AND f1.yr = o2.yr
          AND o2.qtr = f2.qtr AND o2.status = 'O'
WHERE o2.sales / o1.sales > f2.sales / f1.sales
ORDER BY f1.n_name, f1.yr, f1.qtr

-- TPC-DS q50/q62/q99 shape: ship-lag bucket pivot — days between order
-- and ship date bucketed into 30/60/90/90+ conditional counts per
-- supplier nation. Lag is expressed with interval comparisons (the
-- portable form — DATEDIFF argument order differs across engines).
SELECT n_name,
       COUNT(CASE WHEN l_shipdate <= o_orderdate + INTERVAL '30' DAY
                  THEN 1 END) AS d30,
       COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL '30' DAY
                   AND l_shipdate <= o_orderdate + INTERVAL '60' DAY
                  THEN 1 END) AS d60,
       COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY
                   AND l_shipdate <= o_orderdate + INTERVAL '90' DAY
                  THEN 1 END) AS d90,
       COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL '90' DAY
                  THEN 1 END) AS d90plus
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name

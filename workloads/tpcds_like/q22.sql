-- TPC-DS q44 shape: best and worst performers joined on rank — one
-- ranked frame scanned in both directions (asc + desc row_number),
-- equi-joined on the rank position.
WITH perf AS (
  -- decimal → string → double: the direct decimal cast double-rounds
  -- differently per engine once the scale-12 scaled value tops 2^53;
  -- the string parse is correctly rounded in both
  SELECT l_suppkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS STRING)
           AS DOUBLE) AS net_rev
  FROM lineitem
  GROUP BY l_suppkey),
ranked AS (
  SELECT l_suppkey, net_rev,
         CAST(ROW_NUMBER() OVER (ORDER BY net_rev DESC, l_suppkey)
           AS BIGINT) AS best_rank,
         CAST(ROW_NUMBER() OVER (ORDER BY net_rev ASC, l_suppkey)
           AS BIGINT) AS worst_rank
  FROM perf)
SELECT b.best_rank AS position,
       b.l_suppkey AS best_supp, b.net_rev AS best_rev,
       w.l_suppkey AS worst_supp, w.net_rev AS worst_rev
FROM (SELECT * FROM ranked WHERE best_rank <= 10) b
JOIN (SELECT * FROM ranked WHERE worst_rank <= 10) w
  ON b.best_rank = w.worst_rank
ORDER BY position

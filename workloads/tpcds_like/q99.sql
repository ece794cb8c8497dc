-- The kitchen-sink optimizer stress: six-table star join + ROLLUP +
-- HAVING + per-level window share + rank + top-k LIMIT in a single
-- statement.
WITH base AS (
  SELECT r_name, n_name, p_type,
         CAST(GROUPING(r_name) * 4 + GROUPING(n_name) * 2
              + GROUPING(p_type) AS BIGINT) AS lvl,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  WHERE EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1998
  GROUP BY ROLLUP (r_name, n_name, p_type)
  HAVING COUNT(*) >= 5)
SELECT r_name, n_name, p_type, lvl, rev,
       -- rev is a CORPUS-SCALE aggregate here (the rollup grand-total
       -- row is the whole filtered revenue), so its exact re-sum for
       -- the level share must be DECIMAL(38,6): (18,6) overflows past
       -- 1e12 — hit at sf10 under ANSI mode (r8). Per-row INPUT casts
       -- to (18,6) elsewhere in the canon are safe (sums widen).
       CAST(rev * 100 / CAST(SUM(CAST(rev AS DECIMAL(38,6)))
         OVER (PARTITION BY lvl) AS DOUBLE) AS DOUBLE)
         AS lvl_share,
       RANK() OVER (PARTITION BY lvl ORDER BY rev DESC) AS rnk
FROM base
ORDER BY lvl, rnk, r_name NULLS FIRST, n_name NULLS FIRST,
         p_type NULLS FIRST
LIMIT 100

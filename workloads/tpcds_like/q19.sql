-- TPC-DS q49 shape: worst return ratios per channel — per-channel
-- ratio frames, dual dense ranks (by ratio and by currency amount),
-- kept when either rank is in the top tier, UNION distinct across
-- channels.
WITH ratios AS (
  SELECT l_returnflag AS channel, l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS amt
  FROM lineitem
  GROUP BY l_returnflag, l_partkey),
ranked AS (
  SELECT channel, l_partkey, qty, amt,
         DENSE_RANK() OVER (PARTITION BY channel ORDER BY qty DESC,
                            l_partkey) AS qty_rank,
         DENSE_RANK() OVER (PARTITION BY channel ORDER BY amt DESC,
                            l_partkey) AS amt_rank
  FROM ratios)
SELECT channel, l_partkey, qty_rank, amt_rank
FROM ranked WHERE qty_rank <= 10
UNION
SELECT channel, l_partkey, qty_rank, amt_rank
FROM ranked WHERE amt_rank <= 10
ORDER BY channel, qty_rank, amt_rank, l_partkey

-- TPC-DS q61 shape: promotional-to-total revenue ratio — two one-row
-- aggregates over different slices of the same fact, cross-joined into
-- a single ratio row.
-- BROADCAST(part) (r11): same p_type-filtered part ⋈ lineitem star as
-- the q55 file — the filtered dim outgrows the static broadcast
-- threshold at sf100 (no column stats on temp views) and the probe
-- would flip to a fact-wide SortMergeJoin; the hint pins the
-- filtered-dim broadcast at default conf. DuckDB reads it as a
-- comment (see q55.sql for the measured cliff).
SELECT CAST(promo.rev AS DOUBLE) / total.rev * 100 AS promo_pct
FROM
  (SELECT /*+ BROADCAST(part) */
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
   FROM lineitem JOIN part ON l_partkey = p_partkey
   WHERE p_type = 'PROMO') promo,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
   FROM lineitem) total

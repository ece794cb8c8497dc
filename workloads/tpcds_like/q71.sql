-- TPC-DS q61 shape: promotional-to-total revenue ratio — two one-row
-- aggregates over different slices of the same fact, cross-joined into
-- a single ratio row.
SELECT CAST(promo.rev AS DOUBLE) / total.rev * 100 AS promo_pct
FROM
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
   FROM lineitem JOIN part ON l_partkey = p_partkey
   WHERE p_type = 'PROMO') promo,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
   FROM lineitem) total

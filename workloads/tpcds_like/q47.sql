-- TPC-DS q80 shape: netted channel rollup — per-channel gross, return,
-- and net amounts (sale lines netted against R-flag twins), ROLLUP over
-- channel.
WITH netted AS (
  SELECT l_returnflag AS channel_flag,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS gross,
         CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
           AS DOUBLE) AS discounts
  FROM lineitem
  GROUP BY l_returnflag, EXTRACT(YEAR FROM l_shipdate))
SELECT channel_flag, yr,
       CAST(SUM(CAST(gross AS DECIMAL(18,6))) AS DOUBLE) AS total_gross,
       CAST(SUM(CAST(discounts AS DECIMAL(18,6))) AS DOUBLE)
         AS total_discounts,
       CAST(SUM(CAST(gross - discounts AS DECIMAL(18,6))) AS DOUBLE)
         AS total_net
FROM netted
GROUP BY ROLLUP(channel_flag, yr)
ORDER BY channel_flag NULLS FIRST, yr NULLS FIRST

-- TPC-DS q28 shape: six quantity-band (avg, count, distinct-count)
-- probes over the same fact, cross-joined into one wide row — six
-- scans the optimizer may or may not share.
SELECT b1.avg_price AS avg1, b1.cnt AS cnt1, b1.dst AS dst1,
       b2.avg_price AS avg2, b2.cnt AS cnt2, b2.dst AS dst2,
       b3.avg_price AS avg3, b3.cnt AS cnt3, b3.dst AS dst3,
       b4.avg_price AS avg4, b4.cnt AS cnt4, b4.dst AS dst4,
       b5.avg_price AS avg5, b5.cnt AS cnt5, b5.dst AS dst5,
       b6.avg_price AS avg6, b6.cnt AS cnt6, b6.dst AS dst6
FROM
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 1 AND 8) b1,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 9 AND 16) b2,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 17 AND 24) b3,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 25 AND 32) b4,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 33 AND 40) b5,
  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(l_extendedprice) AS avg_price,
          COUNT(*) AS cnt, COUNT(DISTINCT l_partkey) AS dst
   FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) b6

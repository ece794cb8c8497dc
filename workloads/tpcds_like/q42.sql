-- TPC-DS q32/q92 shape: excess-discount filter — lineitems whose
-- discount exceeds 1.3× the average discount for their part, summed;
-- the q1-style correlated aggregate on a different axis.
SELECT CAST(SUM(CAST(l1.l_extendedprice * l1.l_discount
               AS DECIMAL(18,6))) AS DOUBLE) AS excess_discount_amount
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_size <= 25
  AND l1.l_discount > 1.3 * (
    SELECT CAST(SUM(CAST(l2.l_discount AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)

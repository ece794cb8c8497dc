-- TPC-DS q69 shape: cohort with one EXISTS and two NOT EXISTS gates —
-- customers who ordered in 1996-1998, with no returned line shipped in
-- June 1998 and no 5-LOW order placed in 1998 H1; counted per segment.
SELECT c_mktsegment, COUNT(*) AS cnt
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1998)
  AND NOT EXISTS (
    SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND l_returnflag = 'R'
      AND l_shipdate >= DATE '1998-06-01' AND l_shipdate < DATE '1998-07-01')
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderpriority = '5-LOW'
      AND o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1998-07-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment

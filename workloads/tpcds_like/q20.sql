-- TPC-DS q85/q93 shape: disjunctive multi-band predicates bridging
-- fact and dims — per-priority averages where each band constrains a
-- different (segment × balance × quantity) combination, with a CASE
-- refund model in the aggregate.
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(
         CASE WHEN l_returnflag = 'R'
              THEN l_extendedprice * (1 - l_discount)
              ELSE l_extendedprice * l_discount END
         AS DECIMAL(18,6))) AS DOUBLE) AS refund_model
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE
  (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 0 AND 5000
     AND l_quantity BETWEEN 1 AND 15)
  OR (c_mktsegment = 'AUTOMOBILE' AND c_acctbal BETWEEN 2000 AND 8000
     AND l_quantity BETWEEN 16 AND 35)
  OR (c_mktsegment = 'MACHINERY' AND c_acctbal >= 1000
     AND l_quantity BETWEEN 36 AND 50)
GROUP BY o_orderpriority
ORDER BY o_orderpriority

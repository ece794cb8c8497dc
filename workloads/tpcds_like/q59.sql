-- TPC-DS q13 shape: one aggregate under wide disjunctive band
-- predicates tying fact and dims — three (segment x balance x
-- quantity) bands OR-ed together, the planner's CNF-conversion probe.
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_total,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 0 AND 3000
       AND l_quantity BETWEEN 1 AND 15)
   OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 1000 AND 6000
       AND l_quantity BETWEEN 10 AND 30)
   OR (c_mktsegment = 'FURNITURE' AND c_acctbal BETWEEN 3000 AND 9000
       AND l_quantity BETWEEN 25 AND 50)

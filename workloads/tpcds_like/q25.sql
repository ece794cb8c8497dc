-- TPC-DS q90 shape: ratio of two one-row COUNT subqueries (the am/pm
-- pattern) — early-month vs late-month order volume per fiscal year,
-- cross-joined 1-row frames.
SELECT CAST(am.early AS DOUBLE) / pm.late AS early_to_late_ratio
FROM
  (SELECT COUNT(*) AS early FROM orders
   WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 10
     AND o_orderpriority = '1-URGENT') am,
  (SELECT COUNT(*) AS late FROM orders
   WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 21 AND 28
     AND o_orderpriority = '1-URGENT') pm

-- TPC-DS q88 shape (queries/q88.sql): the canon text is an 8-way cross
-- join of one-row COUNT(*) subqueries over the SAME fact+dim join,
-- differing only in which contiguous quantity band each counts.
-- Collapsed (r8, the r5 q16/q24/q32 single-scan precedent) to ONE scan
-- with conditional aggregation: the 8 bands are disjoint and contiguous
-- (1..50), so COUNT(CASE WHEN band THEN 1 END) over the union filter is
-- value-identical to the 8 independent counts — and the engine reads
-- lineitem once instead of 8 times (the canon member's worst decade
-- step, 4.09x at sf1, was pure repeated-scan mass).
SELECT
  COUNT(CASE WHEN l_quantity BETWEEN 1 AND 6 THEN 1 END) AS c1,
  COUNT(CASE WHEN l_quantity BETWEEN 7 AND 12 THEN 1 END) AS c2,
  COUNT(CASE WHEN l_quantity BETWEEN 13 AND 18 THEN 1 END) AS c3,
  COUNT(CASE WHEN l_quantity BETWEEN 19 AND 24 THEN 1 END) AS c4,
  COUNT(CASE WHEN l_quantity BETWEEN 25 AND 30 THEN 1 END) AS c5,
  COUNT(CASE WHEN l_quantity BETWEEN 31 AND 36 THEN 1 END) AS c6,
  COUNT(CASE WHEN l_quantity BETWEEN 37 AND 42 THEN 1 END) AS c7,
  COUNT(CASE WHEN l_quantity BETWEEN 43 AND 50 THEN 1 END) AS c8
FROM lineitem, orders, supplier
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND l_quantity BETWEEN 1 AND 50 AND o_orderstatus = 'F'
  AND ((l_returnflag = 'R' AND l_discount <= 0.06)
    OR (l_returnflag = 'N' AND l_discount <= 0.04)
    OR (l_returnflag = 'A' AND l_discount <= 0.08))

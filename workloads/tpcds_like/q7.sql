-- TPC-DS q88 shape (queries/q88.sql): an 8-way cross join of one-row
-- COUNT(*) subqueries, each a fact+dim join with disjunctive dim
-- predicates — Catalyst should plan 8 independent broadcast-join
-- aggregates and a free cross product of the 1-row results.
SELECT *
FROM
  (SELECT COUNT(*) AS c1 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 1 AND 6 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s1,
  (SELECT COUNT(*) AS c2 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 7 AND 12 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s2,
  (SELECT COUNT(*) AS c3 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 13 AND 18 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s3,
  (SELECT COUNT(*) AS c4 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 19 AND 24 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s4,
  (SELECT COUNT(*) AS c5 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 25 AND 30 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s5,
  (SELECT COUNT(*) AS c6 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 31 AND 36 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s6,
  (SELECT COUNT(*) AS c7 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 37 AND 42 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s7,
  (SELECT COUNT(*) AS c8 FROM lineitem, orders, supplier
   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
     AND l_quantity BETWEEN 43 AND 50 AND o_orderstatus = 'F'
     AND ((l_returnflag = 'R' AND l_discount <= 0.06)
       OR (l_returnflag = 'N' AND l_discount <= 0.04)
       OR (l_returnflag = 'A' AND l_discount <= 0.08))) s8

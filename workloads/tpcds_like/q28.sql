-- TPC-DS q29/q25 shape: three-arm fact self-join — the sale, its
-- return (R-flag twin on the same order/part), and the customer's
-- repurchase of the same part in a later order.
SELECT s.l_partkey,
       COUNT(*) AS n_cycles,
       CAST(SUM(CAST(s.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sold_qty,
       CAST(SUM(CAST(r.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS ret_qty,
       CAST(SUM(CAST(rep.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         AS repurchase_qty
FROM lineitem s
JOIN orders os ON s.l_orderkey = os.o_orderkey
JOIN lineitem r
  ON r.l_orderkey = s.l_orderkey AND r.l_partkey = s.l_partkey
 AND r.l_returnflag = 'R' AND r.l_linenumber <> s.l_linenumber
JOIN orders ro ON ro.o_custkey = os.o_custkey
 AND ro.o_orderdate > os.o_orderdate
JOIN lineitem rep
  ON rep.l_orderkey = ro.o_orderkey AND rep.l_partkey = s.l_partkey
WHERE s.l_returnflag = 'N'
GROUP BY s.l_partkey
ORDER BY s.l_partkey
LIMIT 100

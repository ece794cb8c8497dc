-- TPC-DS q29/q25 shape: three-arm fact self-join — the sale, its
-- return (R-flag twin on the same order/part), and the customer's
-- follow-up purchase lines in a later order. The twin keeps the
-- same-order correlation; the follow-up arm re-joins orders on the
-- customer key with a date inequality (the "came back later" probe).
SELECT s.l_partkey,
       COUNT(*) AS n_cycles,
       CAST(SUM(CAST(s.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sold_qty,
       CAST(SUM(CAST(r.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS ret_qty,
       CAST(SUM(CAST(rep.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         AS followup_qty
FROM lineitem s
JOIN orders os ON s.l_orderkey = os.o_orderkey
JOIN lineitem r
  ON r.l_orderkey = s.l_orderkey AND r.l_partkey = s.l_partkey
 AND r.l_returnflag = 'R' AND r.l_linenumber <> s.l_linenumber
JOIN orders ro ON ro.o_custkey = os.o_custkey
 AND ro.o_orderdate > os.o_orderdate
JOIN lineitem rep ON rep.l_orderkey = ro.o_orderkey
WHERE s.l_returnflag = 'N'
GROUP BY s.l_partkey
ORDER BY s.l_partkey
LIMIT 100

-- TPC-DS q36/q70 shape: rollup + grouping() hierarchy + rank within
-- the subtotal level (CASE in the window partition key). Balances are
-- summed as DECIMAL(18,6) (exact, order-independent) and cast to
-- DOUBLE only at the output edge so Spark and the oracle agree bitwise.
SELECT * FROM (
  SELECT n_name, r_name,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
         CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy,
         RANK() OVER (
           PARTITION BY GROUPING(r_name) + GROUPING(n_name),
                        CASE WHEN GROUPING(n_name) = 0 THEN r_name END
           ORDER BY SUM(CAST(s_acctbal AS DECIMAL(18,6))) DESC) AS rank_within_parent
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP(r_name, n_name))
ORDER BY lochierarchy DESC, rank_within_parent,
         r_name NULLS FIRST, n_name NULLS FIRST

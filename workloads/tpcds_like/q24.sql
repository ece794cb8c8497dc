-- TPC-DS q58 shape: three-way equal-share screen — a part's revenue in
-- each of three channels must sit within 10% of the cross-channel
-- average; three CTE aggregates joined pairwise on the key.
WITH r AS (
  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey),
n AS (
  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
a AS (
  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey)
SELECT r.l_partkey, r.rev AS r_rev, n.rev AS n_rev, a.rev AS a_rev,
       (r.rev + n.rev + a.rev) / 3 AS avg_rev
FROM r
JOIN n ON r.l_partkey = n.l_partkey
JOIN a ON r.l_partkey = a.l_partkey
WHERE r.rev BETWEEN 0.9 * (r.rev + n.rev + a.rev) / 3
                AND 1.1 * (r.rev + n.rev + a.rev) / 3
  AND n.rev BETWEEN 0.9 * (r.rev + n.rev + a.rev) / 3
                AND 1.1 * (r.rev + n.rev + a.rev) / 3
  AND a.rev BETWEEN 0.9 * (r.rev + n.rev + a.rev) / 3
                AND 1.1 * (r.rev + n.rev + a.rev) / 3
ORDER BY r.l_partkey
LIMIT 100

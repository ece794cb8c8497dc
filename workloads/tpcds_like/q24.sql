-- TPC-DS q58 shape: three-way equal-share screen — a part's revenue in
-- each of three channels must sit within 10% of the cross-channel
-- average. The reference's channels are distinct tables; transposed
-- onto the single fact they became three lineitem CTEs differing only
-- in l_returnflag + a 3-way self-join, which collapses to ONE scan
-- with conditional sums (r5 rewrite, DuckDB-diffed value-identical).
-- The BETWEEN screens reproduce the inner-join existence requirement:
-- a part missing any flag has a NULL conditional sum, and NULL
-- comparisons drop the row exactly like the lost join match did.
WITH per_flag AS (
  SELECT l_partkey,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS r_rev,
         CAST(SUM(CASE WHEN l_returnflag = 'N'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS n_rev,
         CAST(SUM(CASE WHEN l_returnflag = 'A'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS a_rev
  FROM lineitem WHERE l_returnflag IN ('R', 'N', 'A')
  GROUP BY l_partkey)
SELECT l_partkey, r_rev, n_rev, a_rev,
       (r_rev + n_rev + a_rev) / 3 AS avg_rev
FROM per_flag
WHERE r_rev BETWEEN 0.9 * (r_rev + n_rev + a_rev) / 3
                AND 1.1 * (r_rev + n_rev + a_rev) / 3
  AND n_rev BETWEEN 0.9 * (r_rev + n_rev + a_rev) / 3
                AND 1.1 * (r_rev + n_rev + a_rev) / 3
  AND a_rev BETWEEN 0.9 * (r_rev + n_rev + a_rev) / 3
                AND 1.1 * (r_rev + n_rev + a_rev) / 3
ORDER BY l_partkey
LIMIT 100

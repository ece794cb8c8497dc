-- Mixed-granularity GROUPING SETS: (priority x status), priority-only,
-- year-only, and the grand total in one pass, levels tagged via the
-- grouping flags.
SELECT o_orderpriority, o_orderstatus,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(GROUPING(o_orderpriority) * 4 + GROUPING(o_orderstatus) * 2
            + GROUPING(EXTRACT(YEAR FROM o_orderdate)) AS BIGINT) AS gid,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority),
                        (EXTRACT(YEAR FROM o_orderdate)), ())
ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST,
         yr NULLS FIRST

-- Conditional COUNT(DISTINCT CASE ...): distinct buyers per year split
-- by channel condition in one aggregate pass (three distinct
-- aggregates sharing a scan).
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                           THEN o_custkey END) AS urgent_buyers,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'F'
                           THEN o_custkey END) AS finished_buyers,
       COUNT(DISTINCT o_custkey) AS all_buyers
FROM orders
GROUP BY EXTRACT(YEAR FROM o_orderdate)
ORDER BY yr

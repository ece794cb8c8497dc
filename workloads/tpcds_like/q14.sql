-- TPC-DS q78 shape: fact-to-fact LEFT JOIN with NULL-retention — per
-- (customer, year) order totals left-joined to their returned-line
-- totals, keeping customers with no returns, emitting return ratios.
WITH ordered AS (
  SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sales
  FROM orders
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)),
returned AS (
  SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS returned_amt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate))
SELECT o.custkey, o.yr, o.sales,
       COALESCE(r.returned_amt, 0.0) AS returned_amt,
       COALESCE(r.returned_amt, 0.0) / o.sales AS return_ratio
FROM ordered o
LEFT JOIN returned r ON o.custkey = r.custkey AND o.yr = r.yr
ORDER BY return_ratio DESC, o.custkey, o.yr
LIMIT 100

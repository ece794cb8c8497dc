-- TPC-DS q12/q20 shape: item revenue share within its class over one
-- ship-month window — per-part sums against the class total via a
-- partition window.
SELECT p_type, p_name, item_rev,
       CAST(item_rev * 100 / SUM(item_rev) OVER (PARTITION BY p_type)
         AS DOUBLE) AS revenueratio
FROM (
  SELECT p_type, p_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS item_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY p_type, p_name)
ORDER BY p_type, revenueratio DESC, p_name

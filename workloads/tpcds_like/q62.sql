-- TPC-DS q12/q20 shape: item revenue share within its class over one
-- ship-month window — per-part sums against the class total via a
-- partition window. The window SUM runs over the EXACT decimal
-- (order-independent); doubles appear only at the edge via the
-- decimal -> string -> double round-trip both engines parse identically
-- (same pattern as the gated q26 revenue-share file).
SELECT p_type, p_name,
       CAST(CAST(item_rev_dec AS STRING) AS DOUBLE) AS item_rev,
       CAST(CAST(item_rev_dec AS STRING) AS DOUBLE) * 100
         / CAST(CAST(SUM(item_rev_dec) OVER (PARTITION BY p_type)
                AS STRING) AS DOUBLE) AS revenueratio
FROM (
  SELECT p_type, p_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS item_rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY p_type, p_name)
ORDER BY p_type, revenueratio DESC, p_name

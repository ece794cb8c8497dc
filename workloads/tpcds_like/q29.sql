-- TPC-DS q75 shape: year-over-year decline — channel-union aggregate
-- per (brand, year), self-joined on consecutive years, kept where
-- quantity declined, ordered by the steepest drop.
WITH all_sales AS (
  SELECT p_brand AS brand,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(l_quantity) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS amt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag IN ('N', 'A')
  GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate))
SELECT cur.brand, prev.yr AS prev_year, cur.yr AS cur_year,
       prev.qty AS prev_qty, cur.qty AS cur_qty,
       cur.qty - prev.qty AS qty_delta,
       cur.amt - prev.amt AS amt_delta
FROM all_sales cur
JOIN all_sales prev
  ON cur.brand = prev.brand AND cur.yr - prev.yr = 1
WHERE cur.qty < prev.qty
ORDER BY qty_delta, cur.brand, cur.yr
LIMIT 100

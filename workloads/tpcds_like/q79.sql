-- TPC-DS q83 shape: returned quantity per part across yearly windows
-- defined by date-IN-subqueries, each arm joined on the part and
-- emitting its share of the two-arm total.
WITH r96 AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1996
    AND CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) IN (
      SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND EXTRACT(YEAR FROM o_orderdate) = 1996)
  GROUP BY l_partkey),
r97 AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1997
    AND CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) IN (
      SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND EXTRACT(YEAR FROM o_orderdate) = 1997)
  GROUP BY l_partkey)
SELECT p_name, r96.qty AS qty_1996, r97.qty AS qty_1997,
       CAST(r96.qty / (r96.qty + r97.qty) AS DOUBLE) AS share_1996
FROM r96 JOIN r97 ON r96.pk = r97.pk
JOIN part ON r96.pk = p_partkey
ORDER BY p_name

-- TPC-DS q48 shape: flat band arithmetic — one aggregate over a
-- disjunction of (status × price-band × quantity-band) conjunctions,
-- no grouping, testing predicate factoring and scan pushdown.
SELECT SUM(l_quantity) AS total_qty,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE
  (o_orderstatus = 'F'
     AND o_totalprice BETWEEN 500 AND 150000
     AND l_quantity BETWEEN 1 AND 20)
  OR (o_orderstatus = 'O'
     AND o_totalprice BETWEEN 1000 AND 200000
     AND l_quantity BETWEEN 21 AND 35)
  OR (o_orderstatus = 'P'
     AND o_totalprice BETWEEN 100 AND 250000
     AND l_quantity BETWEEN 36 AND 50)

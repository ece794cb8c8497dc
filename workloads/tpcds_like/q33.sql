-- TPC-DS q41 shape: DISTINCT product names via EXISTS over stacked
-- attribute OR-bands — the catalog-search pattern with a deeply
-- disjunctive correlated predicate.
SELECT DISTINCT p_name
FROM part p1
WHERE p_retailprice BETWEEN 905 AND 915
  AND EXISTS (
    SELECT 1 FROM part p2
    WHERE p2.p_brand = p1.p_brand
      AND ((p2.p_type LIKE '%STANDARD%' AND p2.p_size BETWEEN 1 AND 10)
        OR (p2.p_type LIKE '%ECONOMY%' AND p2.p_size BETWEEN 11 AND 25)
        OR (p2.p_type LIKE '%PROMO%' AND p2.p_size BETWEEN 26 AND 40)))
ORDER BY p_name
LIMIT 100

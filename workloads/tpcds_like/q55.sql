-- TPC-DS q3 shape: the classic star probe — fact filtered through one
-- dim attribute (manufacturer analog p_type='PROMO'), revenue per
-- (year, brand), the smallest join+agg in the canon after q55.
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS brand_rev
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type = 'PROMO'
GROUP BY EXTRACT(YEAR FROM l_shipdate), p_brand
ORDER BY yr, brand_rev DESC, p_brand

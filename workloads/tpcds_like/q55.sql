-- TPC-DS q3 shape: the classic star probe — fact filtered through one
-- dim attribute (manufacturer analog p_type='PROMO'), revenue per
-- (year, brand), the smallest join+agg in the canon after q55.
-- BROADCAST(part) (r11): the p_type equality keeps the dim at ~1/6 of
-- the part table, but Spark's size estimate for a filtered scan stays
-- the FULL file size without column stats, so at sf100 the dim
-- outgrows the 10 MB autoBroadcastJoinThreshold and this probe flips
-- to a SortMergeJoin shuffling the whole fact on l_partkey — measured
-- 60.5 s vs 11.4 s broadcast at sf100 (26.9x/decade, BASELINE r10).
-- The hint pins the filtered-dim broadcast at every scale with
-- DEFAULT session conf (the r10 SPARK_GRAFT_BROADCAST env knob was
-- bench-only and inert for library/Verify callers — VERDICT r10
-- item 1); DuckDB parses it as a plain block comment, so the oracle
-- text is unchanged. Full-dim star probes (q54) stay UNhinted: the
-- same r10 leg measured broadcasting a genuinely-full dim 2.3x WORSE.
SELECT /*+ BROADCAST(part) */
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS brand_rev
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type = 'PROMO'
GROUP BY EXTRACT(YEAR FROM l_shipdate), p_brand
ORDER BY yr, brand_rev DESC, p_brand

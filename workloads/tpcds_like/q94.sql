-- Regex + string predicates over the text corpus: documents mentioning
-- the engine vocabulary ('spark' plus a streaming term), tallied per
-- language with average length (RLIKE keeps the predicate codegen'd;
-- the DuckDB oracle twin uses regexp_matches — see
-- graft.sources.TpcdsPromoted's dialect-split section).
SELECT lang, COUNT(*) AS matching,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(n_chars) AS avg_chars
FROM documents
WHERE text RLIKE 'spark' AND text RLIKE 'stream|vector'
GROUP BY lang
ORDER BY lang

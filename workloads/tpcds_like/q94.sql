-- Regex + string predicates over the text corpus: documents mentioning
-- the engine vocabulary ('spark' plus a streaming term), tallied per
-- language with average length (RLIKE keeps the predicate codegen'd).
SELECT lang, COUNT(*) AS matching,
       CAST(AVG(n_chars) AS DOUBLE) AS avg_chars
FROM documents
WHERE text RLIKE 'spark' AND text RLIKE 'stream|vector'
GROUP BY lang
ORDER BY lang

-- Document-corpus profiling: per (lang, source) doc count and length
-- statistics with a HAVING floor — the metadata QA scan a training
-- pipeline runs before ingestion.
SELECT lang, source, COUNT(*) AS docs,
       CAST(AVG(n_chars) AS DOUBLE) AS avg_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
HAVING COUNT(*) >= 2
ORDER BY lang, source

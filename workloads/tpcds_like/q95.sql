-- Array-column SQL: per-label centroid via posexplode of the embedding
-- vector — per-(label, position) mean in exact micro-int arithmetic
-- (ROUND(v*1e6) sums as BIGINT, squares as DECIMAL — bit-stable across
-- engines), then the centroid's L2 norm per label (the SQL surface of
-- the ANN centroid step; DuckDB oracle twin uses generate_series
-- element indexing — see graft.sources.TpcdsPromoted).
SELECT label,
       CAST(SQRT(CAST(SUM(CAST(m_num AS DECIMAL(19,0))
                          * CAST(m_num AS DECIMAL(19,0))) AS DOUBLE))
            / (n * 1e6) AS DOUBLE) AS centroid_norm
FROM (
  SELECT label, pos,
         SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS m_num,
         COUNT(*) AS n
  FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
  GROUP BY label, pos)
GROUP BY label, n
ORDER BY label

-- Array-column SQL: per-label centroid via posexplode of the embedding
-- vector — grouped mean per (label, position), then the centroid's L2
-- norm per label (the SQL surface of the ANN centroid step).
SELECT label, CAST(SQRT(SUM(m * m)) AS DOUBLE) AS centroid_norm
FROM (
  SELECT label, pos, AVG(CAST(v AS DOUBLE)) AS m
  FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
  GROUP BY label, pos)
GROUP BY label
ORDER BY label

-- analysis: compiled with the project, never materialized (dbt analysis-paths)
SELECT r_name, n, n * 100.0 / sum(n) OVER () AS pct
FROM (
  SELECT r_name, count(*) AS n
  FROM {{ ref('nation_region') }}
  WHERE n_nationkey >= {{ var('min_key') }}
  GROUP BY r_name
)

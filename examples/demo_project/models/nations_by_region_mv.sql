{{ config(materialized='materialized_view') }}
SELECT r_name, count(*) AS n_nations, max(n_nationkey) AS max_key
FROM {{ ref('nation_region') }}
GROUP BY r_name

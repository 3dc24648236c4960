{{ config(materialized='view', tags='staging') }}
SELECT n_nationkey, n_name, n_regionkey
FROM {{ source('tpch', 'nation') }}
WHERE n_nationkey >= {{ var('min_key') }}

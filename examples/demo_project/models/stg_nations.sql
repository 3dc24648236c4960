{{ config(materialized='view', tags='staging') }}
SELECT n_nationkey, n_name, n_regionkey
FROM {{ source('tpch', 'nation') }}

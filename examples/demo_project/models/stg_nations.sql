{{ config(materialized='view') }}
SELECT n_nationkey, n_name, n_regionkey
FROM {{ source('tpch', 'nation') }}

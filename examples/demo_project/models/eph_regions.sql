{{ config(materialized='ephemeral') }}
SELECT r_regionkey, r_name FROM {{ source('tpch', 'region') }}

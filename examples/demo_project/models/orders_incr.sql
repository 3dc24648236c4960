{{ config(materialized='incremental', unique_key='o_orderkey') }}
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM {{ source('tpch', 'orders') }}
{% if is_incremental() %}
WHERE o_orderdate > (SELECT max(o_orderdate) FROM {{ this }})
{% endif %}

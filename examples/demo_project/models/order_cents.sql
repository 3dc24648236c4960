{{ config(tags='mart') }}
SELECT o_orderkey,
       {{ cents(o_totalprice) }} AS price_cents,
       {{ demo_utils.cast_as(o_orderpriority, string) }} AS priority_str
FROM {{ source('tpch', 'orders') }}

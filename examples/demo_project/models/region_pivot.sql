{{ config(tags='mart') }}
{% set regions = ['AFRICA', 'AMERICA', 'ASIA'] %}
SELECT n_nationkey,
  {% for r in regions %}
  CASE WHEN r_name = '{{ r }}' THEN 1 ELSE 0 END
    AS in_{{ r }}{% if not loop.last %},{% endif %}
  {% endfor %}
FROM {{ ref('nation_region') }}

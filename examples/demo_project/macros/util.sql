{% macro count_by(rel, key, alias='n') %}
SELECT {{ key }}, count(*) AS {{ alias }}
FROM {{ ref({{ rel }}) }}
GROUP BY {{ key }}
{% endmacro %}

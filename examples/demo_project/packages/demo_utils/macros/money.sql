{# demo_utils — an imported macro package (dbt packages.yml analogue).
   Loaded by ProjectLoader from packages/<name>/macros/*.sql; callable
   bare when unambiguous or namespaced as {{ demo_utils.cents(...) }}. #}

{% macro cents(col) %}CAST(round({{ col }} * 100, 0) AS BIGINT){% endmacro %}

{% macro cast_as(col, data_type) %}CAST({{ col }} AS {{ data_type | upper }}){% endmacro %}

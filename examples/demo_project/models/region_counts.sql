{{ config(persist_docs='true') }}
{{ count_by('nation_region', r_name, alias=n_nations) }}

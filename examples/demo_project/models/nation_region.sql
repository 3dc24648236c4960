SELECT n.n_nationkey, n.n_name, r.r_name
FROM {{ ref('stg_nations') }} n
JOIN {{ ref('eph_regions') }} r ON n.n_regionkey = r.r_regionkey

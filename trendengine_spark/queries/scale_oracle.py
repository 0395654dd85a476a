"""Scale-capable DuckDB oracle twins (r14, VERDICT r13 #3).

A few registry oracles keep a deliberately NAIVE SQL text — e.g.
``join_time_window_counts``'s range join — because a second,
independent *paradigm* is the strongest cross-check at the driver
scales (the Spark side is a window decomposition; agreeing with a
plain range join proves the decomposition, not just the arithmetic).
At sf10 volumes, though, the naive text is quadratic FOR THE BASELINE
ENGINE and dies at its throughput/temp wall — which leaves the sweep
row marked "baseline capacity" instead of PASS even though the Spark
side is fine.

This module carries semantically identical, scale-capable DuckDB
transcriptions of the ENGINE'S OWN plan for those rows. They are
used ONLY by the scale harnesses (``tools/check_oracle.py
--scale-oracle``, the sf10 ``--digest`` sweeps); the registry keeps
the naive text so the driver's tri-scale gate stays cross-paradigm.
``tests/test_queries_smoke.py`` (test_scale_oracle_matches_naive)
pins each scale twin row-identical to its naive sibling at sf0.01,
so the two texts cannot drift apart silently.
"""

#: name -> DuckDB SQL, same output contract as REGISTRY[name].sql
SCALE_ORACLE_SQL: dict[str, str] = {
    # the engine's pair-free n_total - n_own window decomposition
    # (queries/analytics.py), transcribed: linear intermediates at
    # any event density where the naive range join is |L|*|R|-bounded
    # only by the time window. NULL semantics per the r14 fix: NULL-
    # user events count toward nobody; NULL-user purchases emit 0.
    "join_time_window_counts": """
    WITH p AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
      WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, epoch_ms(ts) AS ms2, epoch_ms(ts) // 60000 AS bkt
      FROM events WHERE user_id IS NOT NULL
    ),
    probes AS (
      SELECT event_id, user_id, ms, ms // 60000 + dd.d AS bkt
      FROM p, unnest([-1, 0, 1]) AS dd(d)
      WHERE user_id IS NOT NULL
    ),
    u AS (
      SELECT event_id, bkt, ms AS t, 0 AS is_ev FROM probes
      UNION ALL
      SELECT NULL, bkt, ms2 AS t, 1 AS is_ev FROM e
    ),
    tot AS (
      SELECT event_id, CAST(sum(n) AS BIGINT) AS n_total FROM (
        SELECT event_id, is_ev,
               sum(is_ev) OVER (PARTITION BY bkt ORDER BY t
                 RANGE BETWEEN 60000 PRECEDING AND 60000 FOLLOWING) AS n
        FROM u) w
      WHERE is_ev = 0 GROUP BY event_id
    ),
    own AS (
      SELECT pr.event_id, CAST(count(*) AS BIGINT) AS n_own
      FROM probes pr
      JOIN e ON e.bkt = pr.bkt AND e.user_id = pr.user_id
      WHERE abs(pr.ms - e.ms2) <= 60000
      GROUP BY pr.event_id
    )
    SELECT t.event_id,
           CAST(t.n_total - COALESCE(o.n_own, 0) AS BIGINT) AS n_nearby
    FROM tot t LEFT JOIN own o ON o.event_id = t.event_id
    UNION ALL
    SELECT event_id, CAST(0 AS BIGINT) AS n_nearby
    FROM p WHERE user_id IS NULL
    """,
}

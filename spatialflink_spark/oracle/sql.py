"""DuckDB oracle SQL — golden semantics for every gate query.

Each function returns a self-contained ANSI-ish SQL string runnable by DuckDB
over the driver's pre-registered parquet views (documents, events,
embeddings, ...). The sequences derivation + window assignment arithmetic is
bit-identical to the Spark side (sources/sequences.py, functions/windows.py);
tests/test_oracle_parity.py asserts value-level equality the same way the
driver's CORRECTNESS gate does.

These SQL strings are the in-repo "reference suite" — the role the pandas
oracle plays in SURVEY.md §5.2, expressed declaratively.
"""

from __future__ import annotations

from spatialflink_spark.config import (
    DEFAULT_CONFIG as C,
    DEFAULT_QUERY_POINTS,
    HASH_MOD,
)
from spatialflink_spark.sources.sequences import duck_sequences_cte


def qpoints_values() -> str:
    rows = ", ".join(
        f"('{q.q_id}', {q.q_n_tok}, {q.radius}, {q.k})" for q in DEFAULT_QUERY_POINTS
    )
    return f"(VALUES {rows}) q(q_id, q_n_tok, radius, k)"


def _prologue(sliding: bool = False, tumbling: bool = False) -> str:
    """Shared WITH-clause: sequences (+ tumbling ws and/or sliding swin)."""
    parts = [duck_sequences_cte()]
    if tumbling:
        parts.append(
            f"""
seq_t AS (
  SELECT s.*, CAST(floor(ts_s / {C.tumbling_s}) * {C.tumbling_s} AS BIGINT) AS ws
  FROM sequences s
)"""
        )
    if sliding:
        n = C.sliding_size_s // C.sliding_slide_s
        parts.append(
            f"""
seq_s AS (
  SELECT s.*,
         CAST(floor(ts_s / {C.sliding_slide_s}) * {C.sliding_slide_s}
              - k.k * {C.sliding_slide_s} AS BIGINT) AS ws
  FROM sequences s
  CROSS JOIN (SELECT unnest(range(0, {n})) AS k) k
  WHERE ts_s >= floor(ts_s / {C.sliding_slide_s}) * {C.sliding_slide_s} - k.k * {C.sliding_slide_s}
    AND ts_s <  floor(ts_s / {C.sliding_slide_s}) * {C.sliding_slide_s} - k.k * {C.sliding_slide_s} + {C.sliding_size_s}
)"""
        )
    return "WITH " + ",".join(parts)


def range_tumbling_count() -> str:
    return f"""{_prologue(tumbling=True)}
SELECT ws, q.q_id AS q_id, count(*) AS n_matches
FROM seq_t s
JOIN {qpoints_values()} ON abs(s.n_tok - q.q_n_tok) <= q.radius
GROUP BY ws, q.q_id
ORDER BY ws, q_id
"""


def range_rows() -> str:
    tc = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), s.tokens), "
        f"(a, t) -> (a*131 + t) % {HASH_MOD})"
    )
    return f"""{_prologue(tumbling=True)}
SELECT s.ws AS ws, q.q_id AS q_id, s.doc_id AS doc_id, s.seq_no AS seq_no,
       s.n_tok AS n_tok, s.source AS source,
       abs(s.n_tok - q.q_n_tok) AS dist,
       {tc} AS tok_checksum
FROM seq_t s
JOIN {qpoints_values()} ON abs(s.n_tok - q.q_n_tok) <= q.radius
"""


def knn_sliding() -> str:
    return f"""{_prologue(sliding=True)}
, cand AS (
  SELECT s.ws, q.q_id, q.k, s.doc_id, s.seq_no,
         abs(s.n_tok - q.q_n_tok) AS dist
  FROM seq_s s
  JOIN {qpoints_values()} ON abs(s.n_tok - q.q_n_tok) <= q.radius
),
per_doc AS (
  SELECT ws, q_id, k, doc_id, seq_no, dist,
         row_number() OVER (PARTITION BY ws, q_id, doc_id ORDER BY dist, seq_no) AS rd
  FROM cand
),
ranked AS (
  SELECT ws, q_id, k, doc_id, seq_no, dist,
         row_number() OVER (PARTITION BY ws, q_id ORDER BY dist, doc_id) AS rank
  FROM per_doc WHERE rd = 1
)
SELECT ws, q_id, CAST(rank AS INT) AS rank, doc_id, seq_no, dist
FROM ranked WHERE rank <= k
"""


def join_self_tumbling() -> str:
    r = C.join_radius
    return f"""{_prologue(tumbling=True)}
, pairs AS (
  SELECT l.ws, l.doc_id AS left_doc, r.doc_id AS right_doc,
         l.seq_no AS left_seq, r.seq_no AS right_seq,
         abs(l.n_tok - r.n_tok) AS dist,
         greatest(l.ts_s, r.ts_s) AS pair_ts
  FROM seq_t l JOIN seq_t r
    ON l.ws = r.ws AND abs(l.n_tok - r.n_tok) <= {r} AND l.doc_id <> r.doc_id
),
dedup AS (
  SELECT *, row_number() OVER (
    PARTITION BY ws, left_doc, right_doc
    ORDER BY pair_ts DESC, left_seq DESC, right_seq DESC, dist DESC) AS rn
  FROM pairs
)
SELECT ws, left_doc, right_doc, left_seq, right_seq, dist, pair_ts
FROM dedup WHERE rn = 1
"""


def variation_sliding() -> str:
    return f"""{_prologue(sliding=True)}
SELECT source, ws, max(n_tok) - min(n_tok) AS variation,
       count(*) AS n_rows
FROM seq_s GROUP BY source, ws
"""


def variance_sliding() -> str:
    return f"""{_prologue(sliding=True)}
, acc AS (
  SELECT source, ws, count(*) AS n,
         sum(CAST(n_tok AS BIGINT)) AS s,
         sum(CAST(n_tok AS BIGINT) * CAST(n_tok AS BIGINT)) AS s2
  FROM seq_s GROUP BY source, ws
)
SELECT source, ws, n AS n_rows,
       round(greatest(s2 / n - (s / n) * (s / n), 0.0), 6) AS variance
FROM acc
"""


def trajectory_tumbling() -> str:
    return f"""{_prologue(tumbling=True)}
, collected AS (
  SELECT doc_id, ws,
         list(tokens ORDER BY ts_s, seq_no) AS pts,
         count(*) AS n_points
  FROM seq_t GROUP BY doc_id, ws
)
SELECT doc_id, ws, n_points,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(pts, p -> len(p))), (a, x) -> a + x) AS BIGINT) AS traj_len,
       list_reduce(list_prepend(CAST(0 AS BIGINT), flatten(pts)),
            (a, t) -> (a*131 + t) % {HASH_MOD}) AS traj_checksum
FROM collected
"""


def heatmap_sliding() -> str:
    g = C.grid
    cell = (
        f"CAST(least(greatest(floor(n_tok / {g.cell_len}), 0), "
        f"{g.num_cells - 1}) AS INT)"
    )
    return f"""{_prologue(sliding=True)}
, per_doc AS (
  SELECT {cell} AS cell, ws, doc_id,
         max(ts_s) - min(ts_s) AS traj_len
  FROM seq_s GROUP BY cell, ws, doc_id
)
SELECT cell, ws, count(*) AS n_docs,
       CAST(sum(traj_len) AS BIGINT) AS sum_len,
       round(avg(traj_len), 6) AS avg_len,
       CAST(min(traj_len) AS BIGINT) AS min_len,
       CAST(max(traj_len) AS BIGINT) AS max_len
FROM per_doc GROUP BY cell, ws
"""


def tstats_running() -> str:
    return f"""{_prologue()}
, guard AS (
  SELECT doc_id, seq_no, n_tok, ts_s,
         max(ts_s) OVER (PARTITION BY doc_id ORDER BY seq_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM sequences
),
accepted AS (
  SELECT doc_id, seq_no, n_tok, ts_s,
         lag(ts_s) OVER (PARTITION BY doc_id ORDER BY seq_no) AS p_ts,
         lag(n_tok) OVER (PARTITION BY doc_id ORDER BY seq_no) AS p_nt
  FROM guard WHERE prev_max IS NULL OR ts_s > prev_max
),
per_doc AS (
  SELECT doc_id, count(*) AS n_accepted,
         CAST(coalesce(sum(abs(n_tok - p_nt)), 0) AS BIGINT) AS cum_len,
         CAST(coalesce(sum(ts_s - p_ts), 0) AS BIGINT) AS cum_dt
  FROM accepted GROUP BY doc_id
),
totals AS (SELECT doc_id, count(*) AS n_seen FROM sequences GROUP BY doc_id)
SELECT t.doc_id, t.n_seen, p.n_accepted, p.cum_len, p.cum_dt,
       CASE WHEN p.cum_dt > 0
            THEN CAST(floor(1000 * p.cum_len / p.cum_dt) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS rate_milli
FROM totals t JOIN per_doc p ON t.doc_id = p.doc_id
"""


def tstats_windowed() -> str:
    """TStats WB twin (operators/stats.windowed_stats) — the per-(doc, ws)
    OOO guard and hop sums, state reset per window."""
    return f"""{_prologue(tumbling=True)}
, guard AS (
  SELECT doc_id, ws, seq_no, n_tok, ts_s,
         max(ts_s) OVER (PARTITION BY doc_id, ws ORDER BY seq_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM seq_t
),
accepted AS (
  SELECT doc_id, ws, seq_no, n_tok, ts_s,
         lag(ts_s) OVER (PARTITION BY doc_id, ws ORDER BY seq_no) AS p_ts,
         lag(n_tok) OVER (PARTITION BY doc_id, ws ORDER BY seq_no) AS p_nt
  FROM guard WHERE prev_max IS NULL OR ts_s > prev_max
),
per_win AS (
  SELECT doc_id, ws, count(*) AS n_accepted,
         CAST(coalesce(sum(abs(n_tok - p_nt)), 0) AS BIGINT) AS win_len,
         CAST(coalesce(sum(ts_s - p_ts), 0) AS BIGINT) AS win_dt
  FROM accepted GROUP BY doc_id, ws
),
totals AS (SELECT doc_id, ws, count(*) AS n_points FROM seq_t GROUP BY doc_id, ws)
SELECT t.doc_id, t.ws, t.n_points, p.n_accepted, p.win_len, p.win_dt,
       CASE WHEN p.win_dt > 0
            THEN CAST(floor(1000 * p.win_len / p.win_dt) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS rate_milli
FROM totals t JOIN per_win p ON t.doc_id = p.doc_id AND t.ws = p.ws
"""


def events_sessionize(gap_s: int = 1800) -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value, event_id
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL THEN 1
                 WHEN ts_s - lag(ts_s) OVER w > {gap_s} THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       min(ts_s) AS sess_start, max(ts_s) AS sess_end,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, sess_id
"""


def events_sliding_stats(size_s: int = 3600, slide_s: int = 900) -> str:
    n = size_s // slide_s
    return f"""
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events
),
ew AS (
  SELECT e.*,
         CAST(floor(ts_s / {slide_s}) * {slide_s} - k.k * {slide_s} AS BIGINT) AS ws
  FROM e CROSS JOIN (SELECT unnest(range(0, {n})) AS k) k
  WHERE ts_s >= floor(ts_s / {slide_s}) * {slide_s} - k.k * {slide_s}
    AND ts_s <  floor(ts_s / {slide_s}) * {slide_s} - k.k * {slide_s} + {size_s}
)
SELECT event_type, ws, count(*) AS n_events,
       round(avg(value), 6) AS avg_value, round(sum(value), 6) AS sum_value
FROM ew GROUP BY event_type, ws
"""


def serde_roundtrip() -> str:
    """Direct checksums of the sequences relation — golden for the JSON
    serialize -> parse round trip (gate.q_serde_roundtrip): any field the
    serializer loses or retypes (arrays included) hash-mismatches."""
    from spatialflink_spark.functions.tokens import duck_tok_checksum

    return f"""{_prologue()}
SELECT doc_id, seq_no, n_tok, source, ts_s,
       {duck_tok_checksum('tokens')} AS tok_checksum
FROM sequences
"""


def binfmt_ingest() -> str:
    """Direct checksums of the sequences relation — golden for the BINARY
    shard round trip (gate.q_binfmt_ingest / sources/binfmt.py): same shape
    as serde_roundtrip on purpose (both grade lossless ingest), but the
    engine path under test is the .tsf writer/parser, including its
    corrupt-file handling (a leaked record from the injected bad shards
    would surface as extra rows here)."""
    from spatialflink_spark.functions.tokens import duck_tok_checksum

    return f"""{_prologue()}
SELECT doc_id, seq_no, n_tok, source, ts_s,
       {duck_tok_checksum('tokens')} AS tok_checksum
FROM sequences
"""


def pack_sequences(capacity: int = 2048) -> str:
    """Twin of gate.q_pack_sequences (operators/packing.pack_stats):
    concat-and-cut context-window packing — per-source running token sum in
    (ts_s, doc_id, seq_no) order, bin = floor(cum_before / capacity)."""
    return f"""{_prologue()}
, c AS (
  SELECT source, n_tok,
         coalesce(sum(CAST(n_tok AS BIGINT)) OVER (
           PARTITION BY source ORDER BY ts_s, doc_id, seq_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM sequences
)
SELECT source, CAST(floor(cum_before / {capacity}) AS BIGINT) AS bin_id,
       count(*) AS n_seqs, CAST(sum(n_tok) AS BIGINT) AS tok_sum
FROM c GROUP BY source, bin_id
"""


def pack_bins_emit(capacity: int = 2048) -> str:
    """Twin of gate.q_pack_bins_emit (operators/packing.pack_emit): the
    packed bins themselves — per-bin position-weighted token checksum over
    every contributing slice, boundary straddles included."""
    cap = capacity
    return f"""{_prologue()}
, placed AS (
  SELECT source, tokens, n_tok,
         CAST(floor(cum_before / {cap}) AS BIGINT) AS b0,
         CAST(cum_before % {cap} AS INT) AS o
  FROM (
    SELECT source, tokens, n_tok,
           coalesce(sum(CAST(n_tok AS BIGINT)) OVER (
             PARTITION BY source ORDER BY ts_s, doc_id, seq_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM sequences
  ) WHERE n_tok > 0
),
spans AS (
  SELECT source, tokens, n_tok, b0, o,
         unnest(range(0, CAST(floor((o + n_tok - 1) / {cap}) AS INT) + 1)) AS j
  FROM placed
),
sliced AS (
  SELECT source, b0 + j AS bin_id,
         greatest(0, j * {cap} - o) AS st,
         least(n_tok, (j + 1) * {cap} - o) - greatest(0, j * {cap} - o) AS ln,
         o + greatest(0, j * {cap} - o) - j * {cap} AS pos0,
         tokens
  FROM spans
),
part AS (
  SELECT source, bin_id, ln,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, ln + 1),
             i -> (CAST(pos0 AS BIGINT) + i) * (CAST(tokens[CAST(st + i AS INT)] AS BIGINT) + 1))),
           (s, v) -> s + v) AS chk
  FROM sliced
)
SELECT source, CAST(bin_id AS BIGINT) AS bin_id, CAST(count(*) AS INT) AS n_parts,
       CAST(sum(ln) AS BIGINT) AS n_tok_bin, CAST(sum(chk) AS BIGINT) AS tok_checksum
FROM part GROUP BY source, bin_id
"""


def count_windows_tumbling(size: int = 4) -> str:
    """Per-key tumbling COUNT windows — twin of gate.q_count_windows_tumbling
    (countWindow semantics on the deterministic arrival order)."""
    return f"""{_prologue()}
, ranked AS (
  SELECT doc_id, n_tok,
         CAST(floor((row_number() OVER (PARTITION BY doc_id ORDER BY ts_s, seq_no) - 1)
              / {size}) AS INT) AS win_id
  FROM sequences
)
SELECT doc_id, win_id, count(*) AS n_rows,
       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok,
       min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok
FROM ranked GROUP BY doc_id, win_id
"""


def token_freq_topk(k: int = 20) -> str:
    """Twin of operators/corpus.token_freq_topk: exact token heavy hitters
    with distinct-doc frequency, deterministic (count desc, token asc)."""
    return f"""{_prologue()}
, tok AS (SELECT unnest(tokens) AS token, doc_id FROM sequences),
agg AS (
  SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM tok GROUP BY token
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS INT) AS rank
  FROM agg
)
SELECT rank, token, n_occurrences, n_docs FROM ranked WHERE rank <= {k}
"""


def source_length_quantiles() -> str:
    """Twin of operators/corpus.source_length_quantiles: exact type-1
    quantiles from the per-(source, n_tok) count distribution."""
    from spatialflink_spark.operators.corpus import QUANTILES

    quants = ", ".join(
        f"min(CASE WHEN 100 * cum >= {q} * n_rows THEN n_tok END) AS p{q}"
        for q in QUANTILES
    )
    return f"""{_prologue()}
, dist AS (SELECT source, n_tok, count(*) AS c FROM sequences GROUP BY source, n_tok),
cum AS (
  SELECT source, n_tok, c,
         sum(c) OVER (PARTITION BY source ORDER BY n_tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dist
),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_rows FROM dist GROUP BY source)
SELECT c.source, t.n_rows, {quants}
FROM cum c JOIN tot t ON c.source = t.source
GROUP BY c.source, t.n_rows
"""

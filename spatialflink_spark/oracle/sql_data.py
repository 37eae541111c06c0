"""DuckDB oracle SQL for the training-data operators (dedup / similarity /
text analysis / multimodal scalar features) — bit-identical twins of
operators/{dedup,similarity,text,multimodal}.py."""

from __future__ import annotations

from spatialflink_spark.config import HASH_MOD
from spatialflink_spark.functions import tokens as T
from spatialflink_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    N_HASHES,
    ROWS_PER_BAND,
    SHINGLE_K,
)
from spatialflink_spark.operators.similarity import (
    DEFAULT_K,
    QUERY_VEC_ID,
    SIGN_BITS,
)
from spatialflink_spark.operators.text import (
    LANG_ORDER,
    QUALITY_SQL,
    lang_score_sql,
    pred_lang_sql,
)

_W = T.duck_words("text")


def _duck_shingle_hashes() -> str:
    sh = T.duck_word_shingles("text", SHINGLE_K)
    return (
        f"list_distinct(list_transform({sh}, "
        "s -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, length(s)+1), i -> ascii(substr(s, i, 1)))), "
        f"(a, c) -> (a*31 + c) % {HASH_MOD})))"
    )


def exact_dedup() -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string({_W}, ' ')) AS content_hash,
       CAST(row_number() OVER (
         PARTITION BY md5(array_to_string({_W}, ' ')) ORDER BY doc_id
       ) AS INT) AS dup_rank
FROM documents
"""


def _decon_ctes(src_rel: str, min_overlap: int = 3) -> str:
    """Decontamination CTE block over `src_rel` (shared by decontaminate()
    and curation_pipeline() so the logic — threshold included — exists
    once): hs/probe/trainh/conta, where conta holds each contaminated
    training doc with its overlap count."""
    return f"""hs AS (
  SELECT doc_id, list_distinct({_duck_shingle_hashes()}) AS _hs FROM {src_rel}
),
probe AS (
  SELECT DISTINCT unnest(_hs) AS h FROM hs WHERE doc_id % 13 = 0
),
trainh AS (
  SELECT doc_id, unnest(_hs) AS h FROM hs WHERE doc_id % 13 <> 0
),
conta AS (
  SELECT t.doc_id, count(*) AS n_shared_shingles
  FROM trainh t JOIN probe p USING (h)
  GROUP BY t.doc_id HAVING count(*) >= {min_overlap}
)"""


def _mix_sql(src_rel: str) -> str:
    """Quota-mixing CTEs + final SELECT over `src_rel` (shared by
    source_mix() and curation_pipeline()). Mirrors operators/mixing.py
    exactly: try_cast weight with default 1, src_toks = 0 keeps everything,
    doc_id folded mod 2^31 before the LCG multiply."""
    return f"""t AS (
  SELECT doc_id, source, CAST(len({_W}) AS BIGINT) AS n_w,
         coalesce(TRY_CAST(substr(source, 4) AS INT) % 5 + 1, 1) AS w
  FROM {src_rel}
),
per_src AS (
  SELECT source, w, sum(n_w) AS src_toks FROM t GROUP BY source, w
),
totals AS (
  SELECT sum(src_toks) AS total_toks, sum(CAST(w AS BIGINT)) AS w_sum FROM per_src
),
rates AS (
  -- unit scaling mirrors operators/mixing.py: numerator overflow headroom
  -- past ~1.8e14 tokens, exact (unit = 1) at any test scale
  SELECT source,
         CAST(CASE WHEN src_toks // u = 0 THEN 10000 ELSE
           least(10000, (10000 * per_src.w * (total_toks // u))
                        // (w_sum * (src_toks // u)))
         END AS INT) AS rate_bp
  FROM per_src CROSS JOIN (
    SELECT total_toks, w_sum,
           CAST(greatest(1, total_toks // {2**43}) AS BIGINT) AS u
    FROM totals
  ) totals
)
SELECT t.source, r.rate_bp, count(*) AS n_kept,
       CAST(sum(t.n_w) AS BIGINT) AS tok_kept
FROM t JOIN rates r ON t.source = r.source
WHERE (((t.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 10000
      < r.rate_bp
GROUP BY t.source, r.rate_bp"""


def curation_pipeline() -> str:
    """Twin of gate.q_curation_pipeline — the PRODUCTION composition: exact
    dedup -> wide-fingerprint NEAR-dup dedup (60-bit SimHash pairs ->
    transitive closure -> keep the component representative) ->
    decontamination -> source mixing, fronted by the composed quality
    verdict (the quality_filter() statement nested as a CTE body — the
    source_card pattern), and composed from the SAME snippet helpers the
    standalone oracles use (_wide_sh_cte, _decon_ctes, _mix_sql) so each
    stage's logic exists once."""
    from spatialflink_spark.operators.dedup import SIMHASH_WIDE_HAMMING_MAX

    from spatialflink_spark.gate import PIPE_DECON_OVERLAP as pipe_overlap

    return f"""
WITH RECURSIVE
qf AS ({quality_filter()}),
qdocs AS (
  SELECT d.* FROM documents d
  JOIN (SELECT doc_id FROM qf WHERE keep = 1) k USING (doc_id)
),
canon AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY md5(array_to_string({_W}, ' ')) ORDER BY doc_id
    ) AS rnk FROM qdocs
  ) WHERE rnk = 1
),
surv AS (
  SELECT d.* FROM qdocs d JOIN canon USING (doc_id)
),
{_wide_sh_cte('surv', 'w_')},
ndpairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM w_s l JOIN w_s r ON l.doc_id < r.doc_id
  WHERE bit_count(CAST(xor(l.simhash, r.simhash) AS BIGINT)) <= {SIMHASH_WIDE_HAMMING_MAX}
),
edges AS (SELECT a, b FROM ndpairs UNION SELECT b AS a, a AS b FROM ndpairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
surv2 AS (
  SELECT * FROM surv
  WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
),
{_decon_ctes('surv2', pipe_overlap)},
train AS (
  SELECT * FROM surv2
  WHERE doc_id % 13 <> 0 AND doc_id NOT IN (SELECT doc_id FROM conta)
),
{_mix_sql('train')}
"""


def source_mix() -> str:
    """Twin of gate.q_source_mix (operators/mixing.source_mix_sample):
    integer basis-point quota rates + LCG hash sampling — exact in both
    dialects (bigint floor division, no floats)."""
    return f"""
WITH {_mix_sql('documents')}
"""


def decontaminate(min_overlap: int = 3) -> str:
    """Twin of gate.q_decontaminate (dedup.decontaminate): distinct k-gram
    shingle-hash overlap between the probe slice and the training docs —
    the conta CTE IS the answer (single source of truth with
    curation_pipeline)."""
    return f"""
WITH {_decon_ctes('documents', min_overlap)}
SELECT doc_id, n_shared_shingles FROM conta
"""



def minhash_lsh_pairs(threshold: float = 0.5) -> str:
    sigs = ", ".join(
        f"list_min(list_transform(_hs, h -> (h * {a} + {b}) % {HASH_MOD}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    est = " + ".join(
        f"(CASE WHEN l.sig[{i + 1}] = r.sig[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(N_HASHES)
    )
    return f"""
WITH hs AS (
  SELECT doc_id, {_duck_shingle_hashes()} AS _hs FROM documents
),
sigs AS (
  SELECT doc_id, _hs, [{sigs}] AS sig FROM hs
),
bands AS (
  SELECT s.doc_id, s._hs, s.sig, b.band_id,
         array_to_string(list_slice(s.sig, b.band_id * {ROWS_PER_BAND} + 1,
                                    b.band_id * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ',') AS band_key
  FROM sigs s CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band_id) b
),
cand AS (
  SELECT DISTINCT l.doc_id AS left_doc, r.doc_id AS right_doc,
         l.sig AS l_sig, r.sig AS r_sig, l._hs AS l_hs, r._hs AS r_hs
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
scored AS (
  SELECT left_doc, right_doc,
         round(cast(({est.replace('l.sig', 'l_sig').replace('r.sig', 'r_sig')}) as double) / {N_HASHES}, 6) AS est_sim,
         round(cast(len(list_intersect(l_hs, r_hs)) as double) /
               (len(l_hs) + len(r_hs) - len(list_intersect(l_hs, r_hs))), 6) AS jaccard
  FROM (SELECT left_doc, right_doc,
               any_value(l_sig) l_sig, any_value(r_sig) r_sig,
               any_value(l_hs) l_hs, any_value(r_hs) r_hs
        FROM cand GROUP BY left_doc, right_doc)
)
SELECT * FROM scored WHERE jaccard >= {threshold}
"""


def dedup_components() -> str:
    """Transitive closure over the MinHash near-dup pairs via recursive CTE —
    golden for the engine's iterative min-label propagation (the fixpoint is
    unique, so any convergent algorithm matches)."""
    return f"""
WITH RECURSIVE
pairs AS ({minhash_lsh_pairs()}),
edges AS (SELECT left_doc AS a, right_doc AS b FROM pairs
          UNION SELECT right_doc AS a, left_doc AS b FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
"""


def simhash(bits: int = 16) -> str:
    tok = T.duck_tokenize("text")
    bit_terms = " + ".join(
        "(CASE WHEN list_reduce(list_prepend(0, _t), (a, t) -> a + "
        f"(CASE WHEN CAST(floor(t / {1 << j}) AS INT) % 2 = 1 THEN 1 ELSE -1 END)"
        f") > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents)
SELECT doc_id, CAST({bit_terms} AS INT) AS simhash FROM t
"""


def simhash_dup_pairs(bits: int | None = None, hamming_max: int | None = None) -> str:
    """All-pairs Hamming join — exact twin of the engine's banded op because
    hamming_max < bands makes blocking lossless (pigeonhole, dedup.py)."""
    from spatialflink_spark.operators.dedup import SIMHASH_BITS, SIMHASH_HAMMING_MAX

    bits = SIMHASH_BITS if bits is None else bits
    hamming_max = SIMHASH_HAMMING_MAX if hamming_max is None else hamming_max
    tok = T.duck_tokenize("text")
    bit_terms = " + ".join(
        "(CASE WHEN list_reduce(list_prepend(0, _t), (a, t) -> a + "
        f"(CASE WHEN CAST(floor(t / {1 << j}) AS INT) % 2 = 1 THEN 1 ELSE -1 END)"
        f") > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
s AS (SELECT doc_id, CAST({bit_terms} AS INT) AS simhash FROM t),
pairs AS (
  SELECT l.doc_id AS left_doc, r.doc_id AS right_doc,
         CAST(bit_count(CAST(xor(l.simhash, r.simhash) AS BIGINT)) AS INT) AS hamming
  FROM s l JOIN s r ON l.doc_id < r.doc_id
)
SELECT * FROM pairs WHERE hamming <= {hamming_max}
"""


def ngram_jaccard_pairs(threshold: float = 0.2, df_cap: int | None = None) -> str:
    from spatialflink_spark.operators.dedup import NGRAM_DF_CAP

    df_cap = NGRAM_DF_CAP if df_cap is None else df_cap
    return f"""
WITH hs AS (
  SELECT doc_id, {_duck_shingle_hashes()} AS _hs FROM documents
),
ex_all AS (SELECT doc_id, unnest(_hs) AS g FROM hs),
freq AS (SELECT g, count(*) AS _df FROM ex_all GROUP BY g),
ex AS (
  SELECT e.doc_id, e.g FROM ex_all e JOIN freq f ON e.g = f.g
  WHERE f._df <= {df_cap}
),
cand AS (
  SELECT DISTINCT l.doc_id AS left_doc, r.doc_id AS right_doc
  FROM ex l JOIN ex r ON l.g = r.g AND l.doc_id < r.doc_id
),
scored AS (
  SELECT c.left_doc, c.right_doc,
         round(cast(len(list_intersect(lh._hs, rh._hs)) as double) /
               (len(lh._hs) + len(rh._hs) - len(list_intersect(lh._hs, rh._hs))), 6) AS jaccard
  FROM cand c
  JOIN hs lh ON lh.doc_id = c.left_doc
  JOIN hs rh ON rh.doc_id = c.right_doc
)
SELECT * FROM scored WHERE jaccard >= {threshold}
"""


def _duck_cos(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (s, v) -> s + v)"
    )
    na = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (s, v) -> s + v)"
    )
    nb = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (s, v) -> s + v)"
    )
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), 6)"


def cosine_topk(k: int = DEFAULT_K) -> str:
    return f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, e.label, {_duck_cos('e.embedding', 'q.q_emb')} AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def cosine_topk_ivf(k: int = DEFAULT_K, bits: int = SIGN_BITS) -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH b AS (SELECT *, CAST({bucket} AS INT) AS bucket FROM embeddings),
q AS (SELECT bucket AS q_bucket, embedding AS q_emb FROM b WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, e.label, {_duck_cos('e.embedding', 'q.q_emb')} AS cos_sim
  FROM b e JOIN q ON e.bucket = q.q_bucket
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def lang_id() -> str:
    scores = ", ".join(
        lang_score_sql(_W, lg, size_fn="len", filter_fn="list_filter")
        + f" AS s_{lg}"
        for lg in LANG_ORDER
    )
    return f"""
WITH d AS (SELECT doc_id, {scores} FROM documents)
SELECT doc_id, s_en, s_de, s_es, s_fr, {pred_lang_sql()} AS pred_lang FROM d
"""


def _quality_ctes(extra_cols: str = "") -> str:
    """CTE block `qd`/`q` computing per-doc quality (plus passthrough
    `extra_cols`) — the one place the quality heuristic exists in this
    dialect; shared by quality_score / quality_topk_per_source /
    dedup_keep_best so a threshold change cannot drift between them."""
    en = lang_score_sql(_W, "en", size_fn="len", filter_fn="list_filter")
    ec = (extra_cols + ", ") if extra_cols else ""
    return f"""qd AS (
  SELECT doc_id, {ec}
         len({_W}) AS n_words,
         length(text) AS n_chars,
         {en} AS stop_ratio,
         round(cast(length(regexp_replace(text, '[^0-9]', '', 'g')) as double) /
               greatest(length(text), 1), 6) AS digit_ratio
  FROM documents
),
q AS (
  SELECT doc_id, {ec}{QUALITY_SQL} AS quality,
         CAST(n_words AS INT) AS n_words,
         CAST(n_chars AS INT) AS n_chars, stop_ratio, digit_ratio
  FROM qd
)"""


def quality_score() -> str:
    return f"""
WITH {_quality_ctes()}
SELECT doc_id, n_words, n_chars, stop_ratio, digit_ratio, quality FROM q
"""


def token_counts() -> str:
    return f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '[ ]+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
       CAST(len({T.duck_tokenize('text')}) AS INT) AS n_engine_tokens
FROM documents
"""


def fingerprint(mod: int = 7) -> str:
    hashes = f"list_sort({_duck_shingle_hashes()})"
    return f"""
WITH h AS (SELECT doc_id, list_filter({hashes}, h -> h % {mod} = 0) AS fp FROM documents)
SELECT doc_id,
       CAST(len(fp) AS INT) AS n_fp,
       list_reduce(list_prepend(CAST(0 AS BIGINT), fp),
                   (a, h) -> (a*131 + h) % {HASH_MOD}) AS fp_checksum
FROM h
"""


def media_features() -> str:
    header = (
        "list_reduce(list_prepend(0, list_transform("
        "range(1, least(length(text), 16) + 1), i -> ascii(substr(text, i, 1)))), "
        "(a, c) -> a + c) % 65536"
    )
    return f"""
SELECT doc_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       CAST(strlen(text) AS INT) AS n_bytes,
       CAST({header} AS INT) AS header_sum
FROM documents
"""


def embedding_dup_pairs(threshold: float = 0.4) -> str:
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS left_vec, b.vec_id AS right_vec,
         {_duck_cos('a.embedding', 'b.embedding')} AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT * FROM pairs WHERE cos_sim >= {threshold}
"""


def embedding_dup_pairs_blocked(
    threshold: float = 0.4, bits: int | None = None, hamming: int | None = None
) -> str:
    from spatialflink_spark.operators.similarity import (
        DUP_BLOCK_BITS,
        DUP_BLOCK_HAMMING,
        _hamming_masks,
    )

    bits = DUP_BLOCK_BITS if bits is None else bits
    hamming = DUP_BLOCK_HAMMING if hamming is None else hamming

    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    masks = ", ".join(str(m) for m in _hamming_masks(bits, hamming))
    return f"""
WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS INT) AS bucket FROM embeddings),
l AS (
  SELECT vec_id AS left_vec, embedding AS l_emb,
         CAST(xor(bucket, m.mask) AS INT) AS probe
  FROM b CROSS JOIN (SELECT unnest([{masks}]) AS mask) m
),
pairs AS (
  SELECT l.left_vec, r.vec_id AS right_vec,
         {_duck_cos('l.l_emb', 'r.embedding')} AS cos_sim
  FROM l JOIN b r ON l.probe = r.bucket AND l.left_vec < r.vec_id
)
SELECT * FROM pairs WHERE cos_sim >= {threshold}
"""


def cosine_topk_ivf_multiprobe(k: int = DEFAULT_K, bits: int = SIGN_BITS) -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    probe = " OR ".join(
        ["e.bucket = q.q_bucket"]
        + [f"e.bucket = xor(q.q_bucket, {1 << i})" for i in range(bits)]
    )
    return f"""
WITH b AS (SELECT *, CAST({bucket} AS INT) AS bucket FROM embeddings),
q AS (SELECT bucket AS q_bucket, embedding AS q_emb FROM b WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, e.label, {_duck_cos('e.embedding', 'q.q_emb')} AS cos_sim
  FROM b e JOIN q ON {probe}
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def cosine_topk_batch(k: int = DEFAULT_K, query_mod: int | None = None) -> str:
    """Oracle for the EXACT batch op as a DIRECT per-query rank — no
    two-stage cut. Matching the engine's two-stage plan against this direct
    form IS the proof that the stage-1 per-(query, bucket) cut drops no
    top-k row."""
    from spatialflink_spark.operators.similarity import QUERY_MOD

    query_mod = QUERY_MOD if query_mod is None else query_mod
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {query_mod} = 0
),
scored AS (
  SELECT q.q_id, e.vec_id, e.label, {_duck_cos('e.embedding', 'q.q_emb')} AS cos_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, vec_id, label, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT q_id, rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def cosine_topk_batch_ann(
    k: int = DEFAULT_K,
    bits: int | None = None,
    hamming: int | None = None,
    query_mod: int | None = None,
) -> str:
    """Oracle for the multi-probe batch ANN: replicates the deterministic
    probe-bucket candidate semantics, then ranks directly per query."""
    from spatialflink_spark.operators.similarity import (
        BATCH_ANN_BITS,
        BATCH_ANN_HAMMING,
        QUERY_MOD,
        _hamming_masks,
    )

    bits = BATCH_ANN_BITS if bits is None else bits
    hamming = BATCH_ANN_HAMMING if hamming is None else hamming
    query_mod = QUERY_MOD if query_mod is None else query_mod
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    masks = ", ".join(str(m) for m in _hamming_masks(bits, hamming))
    return f"""
WITH b AS (SELECT vec_id, label, embedding, CAST({bucket} AS INT) AS bucket FROM embeddings),
qp AS (
  SELECT vec_id AS q_id, embedding AS q_emb,
         CAST(xor(bucket, m.mask) AS INT) AS probe
  FROM b CROSS JOIN (SELECT unnest([{masks}]) AS mask) m
  WHERE vec_id % {query_mod} = 0
),
scored AS (
  SELECT qp.q_id, e.vec_id, e.label, {_duck_cos('e.embedding', 'qp.q_emb')} AS cos_sim
  FROM b e JOIN qp ON e.bucket = qp.probe AND e.vec_id <> qp.q_id
),
ranked AS (
  SELECT q_id, vec_id, label, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT q_id, rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def _km_duck_dist(qv: str, cq: str) -> str:
    """Squared-L2 between two quantized (bigint) vectors."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len({qv}) + 1), "
        f"i -> ({qv}[i] - {cq}[i]) * ({qv}[i] - {cq}[i]))), (s, x) -> s + x)"
    )


def _kmeans_ctes(n_centroids: int, iters: int) -> tuple[list[str], str]:
    """Shared Lloyd-iteration CTE chain (q0, c0, a_i/u_i/c_i ... assigned)
    used by both k-means oracle twins; returns (ctes, final_centroid_cte)."""
    from spatialflink_spark.operators.similarity import KM_QSCALE

    dist = _km_duck_dist
    ctes = [
        f"""q0 AS (
  SELECT vec_id, label, embedding,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
)""",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, qv AS cq FROM q0 WHERE vec_id < {n_centroids})",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM q0 v CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""u{i} AS (
  SELECT cid, list(mv ORDER BY pos) AS new_cq FROM (
    SELECT cid, pos, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS mv
    FROM (SELECT cid, unnest(range(1, len(qv) + 1)) AS pos, unnest(qv) AS v FROM a{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)""")
        ctes.append(
            f"c{i} AS (SELECT c.cid, coalesce(u.new_cq, c.cq) AS cq "
            f"FROM {prev} c LEFT JOIN u{i} u ON c.cid = u.cid)"
        )
    final = f"c{iters}"
    ctes.append(f"""assigned AS (
  SELECT vec_id, label, embedding, cid FROM (
    SELECT v.vec_id, v.label, v.embedding, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM q0 v CROSS JOIN {final} c
  ) WHERE rn = 1
)""")
    return ctes, final


def cosine_topk_ivf_kmeans(
    k: int = DEFAULT_K,
    n_centroids: int | None = None,
    iters: int | None = None,
    n_probe: int | None = None,
) -> str:
    """Twin of similarity.cosine_topk_ivf_kmeans: the same quantized-integer
    Lloyd iterations unrolled as CTEs (integer sums are associative, so the
    two dialects' aggregation orders cannot diverge), then probe + exact
    cosine re-rank."""
    from spatialflink_spark.operators.similarity import (
        KM_CENTROIDS,
        KM_ITERS,
        KM_PROBE,
        QUERY_VEC_ID,
    )

    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    n_probe = KM_PROBE if n_probe is None else n_probe
    ctes, final = _kmeans_ctes(n_centroids, iters)
    dist = _km_duck_dist
    ctes.append(f"""probed AS (
  SELECT cid, q_emb FROM (
    SELECT c.cid, v.embedding AS q_emb,
           row_number() OVER (ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM q0 v CROSS JOIN {final} c WHERE v.vec_id = {QUERY_VEC_ID}
  ) WHERE rn <= {n_probe}
)""")
    ctes.append(f"""scored AS (
  SELECT a.vec_id, a.label, {_duck_cos('a.embedding', 'p.q_emb')} AS cos_sim
  FROM assigned a JOIN probed p ON a.cid = p.cid
  WHERE a.vec_id <> {QUERY_VEC_ID}
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body},
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def cosine_topk_batch_kmeans(
    k: int = DEFAULT_K,
    n_centroids: int | None = None,
    iters: int | None = None,
    n_probe: int | None = None,
    query_mod: int | None = None,
) -> str:
    """Twin of similarity.cosine_topk_batch_kmeans: batch retrieval over the
    learned IVF — per-query n_probe nearest centroids, candidates by
    centroid equi-join, direct per-query rank (the direct form the engine's
    two-stage cut must equal)."""
    from spatialflink_spark.operators.similarity import (
        KM_CENTROIDS,
        KM_ITERS,
        KM_PROBE,
        QUERY_MOD,
    )

    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    n_probe = KM_PROBE if n_probe is None else n_probe
    query_mod = QUERY_MOD if query_mod is None else query_mod
    ctes, final = _kmeans_ctes(n_centroids, iters)
    dist = _km_duck_dist
    ctes.append(f"""qprobe AS (
  SELECT q_id, q_emb, cid FROM (
    SELECT v.vec_id AS q_id, v.embedding AS q_emb, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM q0 v CROSS JOIN {final} c WHERE v.vec_id % {query_mod} = 0
  ) WHERE rn <= {n_probe}
)""")
    ctes.append(f"""scored AS (
  SELECT p.q_id, a.vec_id, a.label, {_duck_cos('a.embedding', 'p.q_emb')} AS cos_sim
  FROM assigned a JOIN qprobe p ON a.cid = p.cid AND a.vec_id <> p.q_id
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body},
ranked AS (
  SELECT q_id, vec_id, label, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT q_id, rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {k}
"""


def duck_wide_bit_terms() -> str:
    """The 60-bit wide-SimHash fold over staged _h1/_h2 hash-array columns
    (DuckDB dialect) — shared by the documents-table CTE chain below and
    the token-stream oracles in sql_apps."""
    from spatialflink_spark.operators.dedup import SIMHASH_WIDE_BITS

    return " + ".join(
        f"(CASE WHEN list_reduce(list_prepend(0, {'_h1' if j < 30 else '_h2'}), "
        f"(a, h) -> a + (CASE WHEN (h // {1 << (j % 30)}) % 2 = 1 THEN 1 ELSE -1 END)"
        f") > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_WIDE_BITS)
    )


def _wide_sh_cte(src_rel: str = "documents", prefix: str = "") -> str:
    """Wide-fingerprint CTE chain over `src_rel` — hash arrays from the SAME
    builder the engine uses (dedup.wide_hash_chain, 'duck' dialect), so the
    constants and mixing steps cannot drift between dialects. `prefix`
    namespaces the CTE names (t/hx/s) for composition into larger queries
    whose other snippets use the same names (curation_pipeline's mix CTEs
    also define `t`)."""
    from spatialflink_spark.operators.dedup import (
        WIDE_SEED_H1,
        WIDE_SEED_H2,
        wide_hash_chain,
    )

    tok = T.duck_tokenize("text")
    bit_terms = duck_wide_bit_terms()
    return (
        f"{prefix}t AS (SELECT doc_id, {tok} AS _t FROM {src_rel}),\n"
        f"{prefix}hx AS (SELECT doc_id, {wide_hash_chain('_t', WIDE_SEED_H1, 'duck')} AS _h1, "
        f"{wide_hash_chain('_t', WIDE_SEED_H2, 'duck')} AS _h2 FROM {prefix}t),\n"
        f"{prefix}s AS (SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM {prefix}hx)"
    )


def simhash_wide() -> str:
    """Twin of dedup.simhash_wide: 60-bit fingerprint, seeded
    xorshift-multiply bit features from the shared wide_hash_chain
    builder."""
    return f"""
WITH {_wide_sh_cte()}
SELECT doc_id, simhash FROM s
"""


def simhash_wide_dup_pairs(hamming_max: int | None = None) -> str:
    """All-pairs Hamming join over the wide fingerprint — exact twin of the
    banded engine op (pigeonhole: hamming_max < bands)."""
    from spatialflink_spark.operators.dedup import SIMHASH_WIDE_HAMMING_MAX

    hamming_max = SIMHASH_WIDE_HAMMING_MAX if hamming_max is None else hamming_max
    return f"""
WITH {_wide_sh_cte()},
pairs AS (
  SELECT l.doc_id AS left_doc, r.doc_id AS right_doc,
         CAST(bit_count(CAST(xor(l.simhash, r.simhash) AS BIGINT)) AS INT) AS hamming
  FROM s l JOIN s r ON l.doc_id < r.doc_id
)
SELECT * FROM pairs WHERE hamming <= {hamming_max}
"""


def dedup_components_wide() -> str:
    """Transitive closure over the WIDE SimHash near-dup pairs (recursive
    CTE) — golden for components-over-wide-pairs; same closure shape as
    dedup_components(), different candidate generator."""
    return f"""
WITH RECURSIVE
pairs AS ({simhash_wide_dup_pairs()}),
edges AS (SELECT left_doc AS a, right_doc AS b FROM pairs
          UNION SELECT right_doc AS a, left_doc AS b FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
"""


# ---- round-5 additions: repetition / diversity / boilerplate / selection --


def doc_repetition(n: int | None = None) -> str:
    """Twin of text.doc_repetition — gram ids from the shared
    text.gram_id_expr builder (both dialects pack base-VOCAB_SIZE)."""
    from spatialflink_spark.operators.text import REP_NGRAM, gram_id_expr

    n = REP_NGRAM if n is None else n
    tok = T.duck_tokenize("text")
    gram = gram_id_expr("_t", "i", n, "duck")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
tt AS (SELECT doc_id, _t FROM t WHERE len(_t) >= {n}),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, len(_t) + {2 - n}), i -> {gram}))
               AS gram
      FROM tt),
per AS (SELECT doc_id, gram, count(*) AS _c FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       CAST(sum(_c) AS BIGINT) AS n_grams,
       round(cast(1.0 as double)
             - cast(count(*) as double) / CAST(sum(_c) AS BIGINT), 6)
         AS dup_gram_frac,
       round(cast(max(_c) as double) / CAST(sum(_c) AS BIGINT), 6)
         AS top_gram_frac
FROM per GROUP BY doc_id
"""


def token_diversity() -> str:
    """Twin of text.token_diversity (type-token ratio + Simpson index —
    IEEE-pinned arithmetic only, no transcendental functions)."""
    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({tok}) AS tok FROM documents),
per AS (SELECT doc_id, tok, count(*) AS _c FROM t GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(sum(_c) AS BIGINT) AS n_tok,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(cast(count(*) as double) / CAST(sum(_c) AS BIGINT), 6) AS ttr,
       round(cast(1.0 as double)
             - cast(CAST(sum(_c * _c) AS BIGINT) as double)
               / CAST(sum(_c) AS BIGINT) / CAST(sum(_c) AS BIGINT), 6)
         AS simpson
FROM per GROUP BY doc_id
"""


def boilerplate_ngrams(min_bp: int | None = None, k: int | None = None) -> str:
    """Twin of corpus.boilerplate_ngrams (integer threshold compare, rank
    over (df DESC, gram_hash) with LIMIT k)."""
    from spatialflink_spark.operators.corpus import (
        BOILERPLATE_MIN_BP,
        BOILERPLATE_TOPK,
    )

    min_bp = BOILERPLATE_MIN_BP if min_bp is None else min_bp
    k = BOILERPLATE_TOPK if k is None else k
    return f"""
WITH hs AS (SELECT doc_id, unnest({_duck_shingle_hashes()}) AS gram_hash
            FROM documents),
d AS (SELECT gram_hash, CAST(count(*) AS BIGINT) AS df FROM hs GROUP BY gram_hash),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
f AS (SELECT gram_hash, df, n_docs FROM d, n
      WHERE 10000 * df >= {min_bp} * n_docs)
SELECT CAST(row_number() OVER (ORDER BY df DESC, gram_hash) AS INT) AS rank,
       gram_hash, df,
       round(cast(df as double) / n_docs, 6) AS df_frac
FROM f ORDER BY df DESC, gram_hash LIMIT {k}
"""


def quality_topk_per_source(k: int | None = None) -> str:
    """Twin of selection.quality_topk_per_source — one window per source
    (the engine's two-stage cut is answer-identical by the bucket-top-k
    containment argument in its docstring)."""
    from spatialflink_spark.operators.selection import SEL_K

    k = SEL_K if k is None else k
    return f"""
WITH {_quality_ctes(extra_cols="source")},
r AS (SELECT source, doc_id, quality,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS INT) AS rank
      FROM q)
SELECT source, rank, doc_id, quality FROM r WHERE rank <= {k}
"""


def shard_assign(n_shards: int | None = None) -> str:
    """Twin of selection.shard_assign — scalar hash from the SAME
    wide_hash_chain builder (duck dialect) over a one-element list."""
    from spatialflink_spark.operators.dedup import wide_hash_chain
    from spatialflink_spark.operators.selection import N_SHARDS, SHARD_SEED

    n_shards = N_SHARDS if n_shards is None else n_shards
    h = f"list_extract({wide_hash_chain('[doc_id]', SHARD_SEED, 'duck')}, 1)"
    return f"""
WITH h AS (SELECT doc_id, {h} AS _h FROM documents),
s AS (SELECT doc_id, CAST(_h % {n_shards} AS INT) AS shard, _h FROM h)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY _h, doc_id) AS INT)
         AS pos
FROM s
"""


def dedup_keep_best() -> str:
    """Twin of dedup.dedup_keep_best: recursive-CTE closure over the wide
    near-dup pairs joined to the quality CTE; canonical member = argmax
    quality (tie: smaller doc_id) per component."""
    return f"""
WITH {_quality_ctes()},
comp AS ({dedup_components_wide()})
SELECT c.doc_id, c.component, q.quality,
       CAST(CASE WHEN row_number() OVER (
         PARTITION BY c.component ORDER BY q.quality DESC, c.doc_id
       ) = 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM comp c JOIN q USING (doc_id)
"""


def quality_filter() -> str:
    """Twin of text.quality_filter — the composed C4/Gopher-style verdict.
    The engine computes repetition per row (zero shuffles); this oracle
    reuses the explode -> GROUP BY doc_repetition() statement, pinning the
    per-row rewrite to the relational definition. Flag conditions come
    verbatim from text.QF_CONDS (one source for both dialects)."""
    from spatialflink_spark.operators.text import QF_CONDS, QF_KEEP, qf_flag_sql

    lang_scores = ", ".join(
        lang_score_sql(_W, lg, size_fn="len", filter_fn="list_filter")
        + f" AS s_{lg}"
        for lg in LANG_ORDER
    )
    flags = ",\n       ".join(
        f"{qf_flag_sql(c)} AS {name}" for name, c in QF_CONDS.items()
    )
    return f"""
WITH {_quality_ctes()},
lang AS (
  SELECT doc_id, {pred_lang_sql()} AS pred_lang
  FROM (SELECT doc_id, {lang_scores} FROM documents) _l
),
rep AS ({doc_repetition()})
SELECT q.doc_id, q.n_words, rep.dup_gram_frac, q.quality, lang.pred_lang,
       {flags},
       {qf_flag_sql(QF_KEEP)} AS keep
FROM q JOIN rep USING (doc_id) JOIN lang USING (doc_id)
"""


def span_dedup(n: int | None = None) -> str:
    """Twin of dedup.span_dedup — corpus duplicate-span removal. Gram ids
    from the shared dedup.span_gram_expr builder (131-base rolling hash,
    one source for both dialects); canonical occurrence via the packed
    (doc_id, position) bigint key. DuckDB list_filter lambda indexes are
    1-based where Spark's filter indexes are 0-based — the position test
    accounts for it on each side."""
    from spatialflink_spark.operators.dedup import (
        SPAN_N,
        SPAN_POS_PACK,
        span_gram_expr,
    )

    n = SPAN_N if n is None else n
    tok = T.duck_tokenize("text")
    gram = span_gram_expr("_t", "i", n, "duck")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
tt AS (SELECT doc_id, _t, len(_t) AS n_tok FROM t),
g AS (SELECT doc_id, CAST(i AS BIGINT) AS p, {gram} AS g
      FROM tt, unnest(range(1, n_tok + {2 - n})) AS u(i)
      WHERE n_tok >= {n}),
s AS (SELECT g, count(*) AS _c,
             min(doc_id * {SPAN_POS_PACK} + p) AS _canon
      FROM g GROUP BY g),
dup AS (SELECT o.doc_id, o.p FROM g o JOIN s USING (g)
        WHERE s._c > 1 AND o.doc_id * {SPAN_POS_PACK} + o.p <> s._canon),
st AS (SELECT doc_id, list_sort(list(p)) AS _starts,
              CAST(count(*) AS BIGINT) AS n_dup_occ
       FROM dup GROUP BY doc_id),
j AS (SELECT tt.doc_id, tt._t, tt.n_tok,
             coalesce(st._starts, []) AS _starts,
             coalesce(st.n_dup_occ, 0) AS n_dup_occ
      FROM tt LEFT JOIN st USING (doc_id)),
c AS (SELECT *, list_distinct(flatten(list_transform(_starts,
             s -> range(s, s + {n})))) AS _cov
      FROM j),
k AS (SELECT *, list_filter(_t, (x, i) -> NOT list_contains(_cov, i))
             AS _kept
      FROM c)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       n_dup_occ,
       CAST(len(_cov) AS BIGINT) AS n_removed,
       round(CASE WHEN n_tok = 0 THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(n_tok - len(_cov) AS DOUBLE) / n_tok END, 6)
         AS keep_frac,
       {T.duck_tok_checksum("_kept")} AS kept_checksum
FROM k
"""


def tfidf_topk_terms(k: int | None = None) -> str:
    """Twin of corpus.tfidf_topk_terms — log-free TF-IDF top-k per doc
    (one IEEE double division of exact integers; ties broken by token id)."""
    from spatialflink_spark.operators.corpus import TFIDF_TOPK

    k = TFIDF_TOPK if k is None else k
    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({tok}) AS tok FROM documents),
tf AS (SELECT doc_id, CAST(tok AS BIGINT) AS tok,
              CAST(count(*) AS BIGINT) AS tf
       FROM t GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             round(CAST(tf.tf * n.n_docs AS DOUBLE) / df.df, 6) AS score
      FROM tf JOIN df USING (tok) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
      FROM s)
SELECT doc_id, CAST(rank AS INT) AS rank, tok, tf, df, score
FROM r WHERE rank <= {k}
"""


def source_overlap_matrix() -> str:
    """Twin of corpus.source_overlap_matrix — near-dup pair counts per
    unordered source pair over the wide fingerprint (all-pairs Hamming
    reference form of the banded engine kernel)."""
    from spatialflink_spark.operators.dedup import SIMHASH_WIDE_HAMMING_MAX

    return f"""
WITH {_wide_sh_cte()},
pairs AS (
  SELECT l.doc_id AS left_doc, r.doc_id AS right_doc
  FROM s l JOIN s r ON l.doc_id < r.doc_id
  WHERE bit_count(CAST(xor(l.simhash, r.simhash) AS BIGINT))
        <= {SIMHASH_WIDE_HAMMING_MAX}
),
sp AS (
  SELECT p.left_doc, p.right_doc, dl.source AS source_l, dr.source AS source_r
  FROM pairs p
  JOIN documents dl ON p.left_doc = dl.doc_id
  JOIN documents dr ON p.right_doc = dr.doc_id
),
e AS (
  SELECT least(source_l, source_r) AS source_a,
         greatest(source_l, source_r) AS source_b,
         doc
  FROM sp, unnest([left_doc, right_doc]) AS u(doc)
)
SELECT source_a, source_b,
       CAST(count(*) // 2 AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
FROM e GROUP BY source_a, source_b
"""


def source_vocab_divergence() -> str:
    """Twin of corpus.source_vocab_divergence — pairwise unigram
    total-variation distance + vocab Jaccard per unordered source pair.
    Exact-integer accumulation (|cnt_a*tot_b - cnt_b*tot_a| and shared-mass
    sums are bigint); only the three final divisions are doubles, with
    identical operands in both dialects."""
    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT source, unnest({tok}) AS tok FROM documents),
cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM t GROUP BY source, tok),
tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS vocab
        FROM cnt GROUP BY source),
f AS (SELECT c.source, c.tok, c.cnt, tt.tot
      FROM cnt c JOIN tot tt ON c.source = tt.source),
sh AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(abs(a.cnt * b.tot - b.cnt * a.tot)) AS BIGINT) AS s_int,
         CAST(sum(a.cnt) AS BIGINT) AS sh_a,
         CAST(sum(b.cnt) AS BIGINT) AS sh_b
  FROM f a JOIN f b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
),
sc AS (SELECT ta.source AS source_a, ta.tot AS tot_a, ta.vocab AS vocab_a,
              tb.source AS source_b, tb.tot AS tot_b, tb.vocab AS vocab_b
       FROM tot ta JOIN tot tb ON ta.source < tb.source)
SELECT sc.source_a, sc.source_b,
       CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
       round(CAST(coalesce(n_shared, 0) AS DOUBLE)
             / (vocab_a + vocab_b - coalesce(n_shared, 0)), 6) AS vocab_jaccard,
       round(0.5 * (CAST(coalesce(s_int, 0) AS DOUBLE) / (tot_a * tot_b)
             + CAST(tot_a - coalesce(sh_a, 0) AS DOUBLE) / tot_a
             + CAST(tot_b - coalesce(sh_b, 0) AS DOUBLE) / tot_b), 6) AS tvd
FROM sc LEFT JOIN sh ON sc.source_a = sh.source_a AND sc.source_b = sh.source_b
"""


def kmeans_label_purity(
    n_centroids: int | None = None, iters: int | None = None
) -> str:
    """Twin of similarity.kmeans_label_purity — the same unrolled
    quantized-Lloyd assignment, then per-cluster majority label (ties to
    the smallest label) and purity fraction."""
    from spatialflink_spark.operators.similarity import KM_CENTROIDS, KM_ITERS

    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    ctes, _ = _kmeans_ctes(n_centroids, iters)
    body = ",\n".join(ctes)
    return f"""
WITH {body},
per AS (SELECT cid, label, CAST(count(*) AS BIGINT) AS n
        FROM assigned GROUP BY cid, label),
top AS (SELECT cid, label AS top_label, n AS n_top FROM (
          SELECT *, row_number() OVER (PARTITION BY cid
                                       ORDER BY n DESC, label ASC) AS rn
          FROM per) WHERE rn = 1),
tot AS (SELECT cid, CAST(sum(n) AS BIGINT) AS n_vecs FROM per GROUP BY cid)
SELECT t.cid, t.n_vecs, p.top_label, p.n_top,
       round(CAST(p.n_top AS DOUBLE) / t.n_vecs, 6) AS purity
FROM tot t JOIN top p ON t.cid = p.cid
"""


def dedup_size_histogram() -> str:
    """Twin of dedup.dedup_size_histogram — component sizes from the
    recursive-CTE closure over the wide near-dup pairs, plus the size-1 row
    for documents untouched by any pair."""
    return f"""
WITH comp AS ({dedup_components_wide()}),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
          FROM comp GROUP BY component),
multi AS (SELECT size, CAST(count(*) AS BIGINT) AS n_components
          FROM sizes GROUP BY size),
singles AS (
  SELECT CAST(1 AS BIGINT) AS size,
         CAST((SELECT count(*) FROM documents)
              - (SELECT count(*) FROM comp) AS BIGINT) AS n_components
),
u AS (SELECT * FROM multi
      UNION ALL SELECT * FROM singles WHERE n_components > 0)
SELECT size, n_components, CAST(size * n_components AS BIGINT) AS n_docs
FROM u
"""


def vocab_growth(bucket: int | None = None) -> str:
    """Twin of corpus.vocab_growth — per-bucket new-token counts off the
    vocab-bounded min-first-doc relation, integer cumulative window."""
    from spatialflink_spark.operators.corpus import VOCAB_GROWTH_BUCKET

    bucket = VOCAB_GROWTH_BUCKET if bucket is None else bucket
    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({tok}) AS tok FROM documents),
first AS (SELECT tok, min(doc_id) AS first_doc FROM t GROUP BY tok),
new_per AS (SELECT CAST(first_doc // {bucket} AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_new_tokens
            FROM first GROUP BY 1),
docs_per AS (SELECT CAST(doc_id // {bucket} AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n_docs
             FROM documents GROUP BY 1)
SELECT d.bucket,
       CAST(d.bucket * {bucket} AS BIGINT) AS first_doc,
       d.n_docs,
       CAST(coalesce(n.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
       CAST(sum(coalesce(n.n_new_tokens, 0)) OVER (
         ORDER BY d.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM docs_per d LEFT JOIN new_per n ON d.bucket = n.bucket
"""


def length_quality_corr() -> str:
    """Twin of corpus.length_quality_corr — exact-bigint moment sums over
    the shared quality CTE, IEEE-pinned final Pearson assembly."""
    from spatialflink_spark.operators.corpus import CORR_QSCALE

    return f"""
WITH {_quality_ctes(extra_cols="source")},
v AS (SELECT source, CAST(n_words AS BIGINT) AS x,
             CAST(round(quality * {CORR_QSCALE}) AS BIGINT) AS y
      FROM q),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM v GROUP BY source
)
SELECT source, n AS n_docs,
       round(CAST(sx AS DOUBLE) / n, 6) AS mean_words,
       round(CAST(sy AS DOUBLE) / n / {CORR_QSCALE}, 6) AS mean_quality,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
            THEN CAST(NULL AS DOUBLE) ELSE
         round(CAST(n * sxy - sx * sy AS DOUBLE) /
               sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       END AS corr_len_quality
FROM agg
"""


def pii_redact() -> str:
    """Twin of text.pii_redact — injected entities, RE2∩Java portable
    regexes; DuckDB needs the explicit 'g' flag where Spark's
    regexp_replace is global by default."""
    from spatialflink_spark.operators.text import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        pii_inject_sql,
    )

    inj = pii_inject_sql("varchar")
    return f"""
WITH d AS (SELECT doc_id, {inj} AS txt FROM documents),
c AS (
  SELECT doc_id, txt,
         CAST(len(regexp_extract_all(txt, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(txt, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
         CAST(len(regexp_extract_all(txt, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
  FROM d
),
r AS (
  SELECT doc_id, n_emails, n_ips, n_phones,
         regexp_replace(regexp_replace(regexp_replace(txt,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'), '{PII_IP_RE}', '<IP>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g') AS red
  FROM c
)
SELECT doc_id, n_emails, n_ips, n_phones,
       n_emails + n_ips + n_phones AS n_pii,
       CAST(length(red) AS BIGINT) AS red_len,
       {T.duck_str_hash('red')} AS red_hash
FROM r
"""


def unigram_rarity() -> str:
    """Twin of corpus.unigram_rarity — exact-integer rarity sum, one final
    double division (floor-before-bigint-cast per the dialect contract)."""
    from spatialflink_spark.operators.corpus import RARITY_SCALE

    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({tok}) AS tok FROM documents),
cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY tok),
j AS (SELECT t.doc_id, cnt.c FROM t JOIN cnt USING (tok)),
a AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CAST(floor({RARITY_SCALE} / c) AS BIGINT)) AS BIGINT)
           AS rarity_sum,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_tok, rarity_sum,
       round(CAST(rarity_sum AS DOUBLE) / n_tok, 6) AS rarity_mean,
       n_hapax
FROM a
"""


def semantic_dedup(
    threshold: float | None = None,
    n_centroids: int | None = None,
    iters: int | None = None,
) -> str:
    """Twin of similarity.semantic_dedup — the shared Lloyd CTE chain, then
    the within-cluster min-id-keeper drop rule."""
    from spatialflink_spark.operators.similarity import (
        KM_CENTROIDS,
        KM_ITERS,
        SEMDEDUP_THRESHOLD,
    )

    threshold = SEMDEDUP_THRESHOLD if threshold is None else threshold
    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    ctes, _ = _kmeans_ctes(n_centroids, iters)
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
drops AS (
  SELECT DISTINCT r.vec_id
  FROM assigned l JOIN assigned r ON l.cid = r.cid AND l.vec_id < r.vec_id
  WHERE {_duck_cos('l.embedding', 'r.embedding')} >= {threshold}
)
SELECT a.vec_id, CAST(a.cid AS INT) AS cid, (d.vec_id IS NULL) AS keep
FROM assigned a LEFT JOIN drops d ON a.vec_id = d.vec_id
"""


def bigram_lift_topk(
    min_support: int | None = None, k: int | None = None
) -> str:
    """Twin of corpus.bigram_lift_topk — encoded-bigint bigram counts,
    log-free lift, bounded final cut."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import (
        BIGRAM_MIN_SUPPORT,
        BIGRAM_TOPK,
    )

    min_support = BIGRAM_MIN_SUPPORT if min_support is None else min_support
    k = BIGRAM_TOPK if k is None else k
    tok = T.duck_tokenize("text")
    V = VOCAB_SIZE
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
bg AS (
  SELECT unnest(CASE WHEN len(_t) >= 2
    THEN list_transform(range(1, len(_t)),
                        i -> CAST(_t[i] AS BIGINT) * {V} + _t[i + 1])
    ELSE CAST([] AS BIGINT[]) END) AS bg
  FROM t
),
cxy AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_xy FROM bg GROUP BY bg),
m AS (SELECT CAST(sum(c_xy) AS BIGINT) AS m FROM cxy),
uc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(_t) AS tok FROM t) GROUP BY tok
),
sup AS (
  SELECT bg, c_xy, CAST(bg // {V} AS INT) AS tok_a,
         CAST(bg % {V} AS INT) AS tok_b
  FROM cxy WHERE c_xy >= {min_support}
),
s AS (
  SELECT sup.tok_a, sup.tok_b, sup.c_xy, ua.c AS c_x, ub.c AS c_y,
         round(CAST(m.m * sup.c_xy AS DOUBLE) / (ua.c * ub.c), 6) AS lift
  FROM sup
  JOIN uc ua ON sup.tok_a = ua.tok
  JOIN uc ub ON sup.tok_b = ub.tok
  CROSS JOIN m
),
r AS (
  SELECT *, row_number() OVER (
    ORDER BY lift DESC, tok_a ASC, tok_b ASC) AS rank
  FROM s
)
SELECT CAST(rank AS INT) AS rank, tok_a, tok_b, c_xy, c_x, c_y, lift
FROM r WHERE rank <= {k}
"""


def source_card() -> str:
    """Twin of corpus.source_card — composes the quality_filter, pii_redact
    and wide-pair STATEMENTS as CTE bodies (nested WITH scopes, the
    dedup_components_wide composition pattern) so the card oracle reuses
    the already-verified kernel twins verbatim."""
    return f"""
WITH
qf AS ({quality_filter()}),
pii AS ({pii_redact()}),
wp AS ({simhash_wide_dup_pairs()}),
nd AS (
  SELECT DISTINCT doc_id FROM (
    SELECT left_doc AS doc_id FROM wp
    UNION ALL SELECT right_doc AS doc_id FROM wp
  )
),
base AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(q.n_words) AS BIGINT) AS n_words,
         CAST(sum(q.keep) AS BIGINT) AS n_keep
  FROM qf q JOIN documents d USING (doc_id)
  GROUP BY d.source
),
nds AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS neardup_docs
  FROM nd JOIN documents d USING (doc_id) GROUP BY d.source
),
ps AS (
  SELECT d.source,
         CAST(sum(CASE WHEN p.n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS pii_docs
  FROM pii p JOIN documents d USING (doc_id) GROUP BY d.source
)
SELECT b.source, b.n_docs, b.n_words,
       round(CAST(b.n_keep AS DOUBLE) / b.n_docs, 6) AS keep_rate,
       CAST(coalesce(n.neardup_docs, 0) AS BIGINT) AS neardup_docs,
       round(CAST(coalesce(n.neardup_docs, 0) AS DOUBLE) / b.n_docs, 6)
         AS neardup_frac,
       p.pii_docs,
       round(CAST(p.pii_docs AS DOUBLE) / b.n_docs, 6) AS pii_frac
FROM base b
LEFT JOIN nds n ON b.source = n.source
JOIN ps p ON b.source = p.source
"""


def dsir_importance() -> str:
    """Twin of corpus.dsir_importance — hashed-bigram bucket counts,
    Laplace-smoothed frequency ratio per feature (same cast structure as
    the engine expression so both sides perform identical IEEE ops)."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import DSIR_BUCKETS, DSIR_SCALE

    tok = T.duck_tokenize("text")
    V, B, S = VOCAB_SIZE, DSIR_BUCKETS, DSIR_SCALE
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
fx AS (
  SELECT doc_id, unnest(CASE WHEN len(_t) >= 2
    THEN list_transform(range(1, len(_t)),
         i -> (CAST(_t[i] AS BIGINT) * {V} + _t[i + 1]) % {B})
    ELSE CAST([] AS BIGINT[]) END) AS f
  FROM t
),
tgt AS (SELECT f, CAST(count(*) AS BIGINT) AS c_t
        FROM fx WHERE doc_id % 13 = 0 GROUP BY f),
raw AS (SELECT f, CAST(count(*) AS BIGINT) AS c_r FROM fx GROUP BY f),
tot AS (SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM tgt) AS t_tot,
               (SELECT CAST(sum(c_r) AS BIGINT) FROM raw) AS r_tot),
j AS (
  SELECT ff.doc_id,
         CAST(floor(
           CAST({S} * (coalesce(tg.c_t, 0) + 1) * (tot.r_tot + {B}) AS DOUBLE)
           / (CAST((rw.c_r + 1) AS DOUBLE) * (tot.t_tot + {B}))
         ) AS BIGINT) AS w
  FROM fx ff
  LEFT JOIN tgt tg ON ff.f = tg.f
  JOIN raw rw ON ff.f = rw.f
  CROSS JOIN tot
),
a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
             CAST(sum(w) AS BIGINT) AS imp_sum
      FROM j GROUP BY doc_id)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS INT) AS is_target,
       n_feat, imp_sum,
       round(CAST(imp_sum AS DOUBLE) / n_feat, 6) AS imp_mean
FROM a
"""


def _pq_sub_ctes(j: int, sub: int, k: int, iters: int) -> tuple[list[str], str]:
    """Per-subspace Lloyd chain over the j-th dimension slice — the
    _kmeans_ctes shape with p{j}-namespaced CTE names and a sliced q0.
    Quantize-then-slice == slice-then-quantize (elementwise round), so
    this matches the engine's shared full-vector quantization."""
    from spatialflink_spark.operators.similarity import KM_QSCALE

    p = f"p{j}"
    lo, hi = j * sub + 1, (j + 1) * sub
    dist = _km_duck_dist
    ctes = [
        f"""{p}q0 AS (
  SELECT vec_id,
         list_transform(embedding[{lo}:{hi}],
                        x -> CAST(round(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
)""",
        f"{p}c0 AS (SELECT CAST(vec_id AS INT) AS cid, qv AS cq "
        f"FROM {p}q0 WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        prev = f"{p}c{i - 1}"
        ctes.append(f"""{p}a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM {p}q0 v CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""{p}u{i} AS (
  SELECT cid, list(mv ORDER BY pos) AS new_cq FROM (
    SELECT cid, pos, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS mv
    FROM (SELECT cid, unnest(range(1, len(qv) + 1)) AS pos, unnest(qv) AS v FROM {p}a{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)""")
        ctes.append(
            f"{p}c{i} AS (SELECT c.cid, coalesce(u.new_cq, c.cq) AS cq "
            f"FROM {prev} c LEFT JOIN {p}u{i} u ON c.cid = u.cid)"
        )
    return ctes, f"{p}c{iters}"


def pq_topk_adc(
    k: int | None = None,
    m: int | None = None,
    n_cent: int | None = None,
    iters: int | None = None,
    dim: int = 64,
) -> str:
    """Twin of similarity.pq_topk_adc — per-subspace Lloyd chains, codes by
    argmin, dense ADC table join, exact-bigint distance sums (no rounding
    contract: everything after quantization is integer)."""
    from spatialflink_spark.operators.similarity import (
        DEFAULT_K,
        PQ_ITERS,
        PQ_K,
        PQ_M,
        QUERY_VEC_ID,
    )

    k = DEFAULT_K if k is None else k
    m = PQ_M if m is None else m
    n_cent = PQ_K if n_cent is None else n_cent
    iters = PQ_ITERS if iters is None else iters
    sub = dim // m
    dist = _km_duck_dist
    all_ctes: list[str] = []
    code_sel, dt_sel = [], []
    for j in range(m):
        ctes, final = _pq_sub_ctes(j, sub, n_cent, iters)
        all_ctes += ctes
        code_sel.append(f"""
  SELECT vec_id, {j} AS j, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM p{j}q0 v CROSS JOIN {final} c
    WHERE v.vec_id <> {QUERY_VEC_ID}
  ) WHERE rn = 1""")
        dt_sel.append(f"""
  SELECT {j} AS j, c.cid, {dist('q.qv', 'c.cq')} AS d
  FROM p{j}q0 q CROSS JOIN {final} c
  WHERE q.vec_id = {QUERY_VEC_ID}""")
    cte_block = ",\n".join(all_ctes)
    codes = " UNION ALL ".join(code_sel)
    dtable = " UNION ALL ".join(dt_sel)
    return f"""
WITH {cte_block},
codes AS ({codes}),
dtable AS ({dtable}),
adc AS (
  SELECT c.vec_id, CAST(sum(d.d) AS BIGINT) AS adc
  FROM codes c JOIN dtable d ON c.j = d.j AND c.code = d.cid
  GROUP BY c.vec_id
),
r AS (
  SELECT vec_id, adc,
         row_number() OVER (ORDER BY adc ASC, vec_id ASC) AS rank
  FROM adc
)
SELECT CAST(rank AS INT) AS rank, vec_id, adc FROM r WHERE rank <= {k}
"""


def bm25_topk(k: int | None = None, query_mod: int | None = None) -> str:
    """Twin of retrieval.bm25_topk — the log-free all-integer BM25: every
    per-term contribution is a product of two integer floor divisions
    (`//` here, `div` in Spark; operands positive, so floor == truncate),
    summed as exact BIGINTs."""
    from spatialflink_spark.operators.retrieval import (
        BM25_K,
        BM25_QUERY_MOD,
        BM25_S1,
        BM25_S2,
    )

    k = BM25_K if k is None else k
    query_mod = BM25_QUERY_MOD if query_mod is None else query_mod
    tok = T.duck_tokenize("text")
    return f"""
WITH tk AS (SELECT doc_id, {tok} AS _t FROM documents),
t AS (SELECT doc_id, unnest(_t) AS tok FROM tk),
postings AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, tok
),
pdl AS (
  SELECT doc_id, tok, tf,
         CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
  FROM postings
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY tok),
scal AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(sum(tf) AS BIGINT) AS l_tot
  FROM postings
),
qterms AS (
  SELECT DISTINCT q_id, tok FROM (
    SELECT doc_id AS q_id, unnest(_t) AS tok FROM tk
    WHERE doc_id % {query_mod} = 0
  )
),
scored AS (
  SELECT q.q_id, p.doc_id,
         CAST(sum(
           (CAST({BM25_S1} AS BIGINT) * (2 * s.n_docs - 2 * d.df + 1)
              // (2 * d.df + 1))
           * (CAST({BM25_S2} AS BIGINT) * 22 * p.tf * s.l_tot
              // (10 * p.tf * s.l_tot + 3 * s.l_tot + 9 * p.dl * s.n_docs))
         ) AS BIGINT) AS bm25
  FROM pdl p
  JOIN qterms q USING (tok)
  JOIN dfreq d USING (tok)
  CROSS JOIN scal s
  WHERE p.doc_id <> q.q_id
  GROUP BY q.q_id, p.doc_id
),
ranked AS (
  SELECT q_id, doc_id, bm25,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY bm25 DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored
)
SELECT q_id, rank, doc_id, bm25 FROM ranked WHERE rank <= {k}
"""


def rrf_fusion(k: int | None = None) -> str:
    """Twin of retrieval.rrf_fusion — the lexical and semantic rank lists
    composed as nested-WITH CTE bodies (inner scopes shadow, the
    source_card pattern), fused by exact-integer reciprocal ranks."""
    from spatialflink_spark.operators.retrieval import (
        BM25_K,
        BM25_QUERY_MOD,
        RRF_DEPTH,
        RRF_K0,
        RRF_SCALE,
    )

    k = BM25_K if k is None else k
    lexsql = bm25_topk(k=RRF_DEPTH)
    semsql = cosine_topk_batch(k=RRF_DEPTH, query_mod=BM25_QUERY_MOD)
    return f"""
WITH lex AS ({lexsql}),
sem AS ({semsql}),
fused AS (
  SELECT coalesce(l.q_id, s.q_id) AS q_id,
         coalesce(l.doc_id, s.vec_id) AS doc_id,
         CAST(CASE WHEN l.rank IS NULL THEN 0
                   ELSE {RRF_SCALE} // ({RRF_K0} + l.rank) END
            + CASE WHEN s.rank IS NULL THEN 0
                   ELSE {RRF_SCALE} // ({RRF_K0} + s.rank) END AS BIGINT) AS rrf,
         CAST(coalesce(l.rank, 0) AS INT) AS r_lex,
         CAST(coalesce(s.rank, 0) AS INT) AS r_sem
  FROM lex l FULL OUTER JOIN sem s
    ON l.q_id = s.q_id AND l.doc_id = s.vec_id
),
rr AS (
  SELECT q_id, doc_id, rrf, r_lex, r_sem,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY rrf DESC, doc_id ASC
         ) AS INT) AS rank
  FROM fused
)
SELECT q_id, rank, doc_id, rrf, r_lex, r_sem FROM rr WHERE rank <= {k}
"""


def ccnet_buckets() -> str:
    """Twin of corpus.ccnet_buckets — the unigram_rarity statement as a
    nested-WITH CTE body, tertile cuts on the bounded rarity grid."""
    from spatialflink_spark.operators.corpus import CCNET_GRID

    return f"""
WITH r AS ({unigram_rarity()}),
g AS (
  SELECT doc_id, n_tok, rarity_sum,
         CAST(rarity_sum // (n_tok * {CCNET_GRID}) AS BIGINT) AS gkey
  FROM r
),
dist AS (SELECT gkey, CAST(count(*) AS BIGINT) AS _c FROM g GROUP BY gkey),
cum AS (
  SELECT gkey,
         CAST(sum(_c) OVER (
           ORDER BY gkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS _cum
  FROM dist
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
cuts AS (
  SELECT min(CASE WHEN 3 * _cum >= n THEN gkey END) AS cut1,
         min(CASE WHEN 3 * _cum >= 2 * n THEN gkey END) AS cut2
  FROM cum CROSS JOIN tot
),
b AS (
  SELECT g.doc_id, g.n_tok, g.rarity_sum,
         CASE WHEN g.gkey <= c.cut1 THEN 'head'
              WHEN g.gkey <= c.cut2 THEN 'middle' ELSE 'tail' END AS bucket
  FROM g CROSS JOIN cuts c
)
SELECT d.source, b.bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(b.n_tok) AS BIGINT) AS n_tok_total,
       round(CAST(sum(b.rarity_sum) AS DOUBLE) / sum(b.n_tok), 6) AS rarity_mean
FROM b JOIN documents d USING (doc_id)
GROUP BY d.source, b.bucket
"""


def hard_negatives(k: int | None = None) -> str:
    """Twin of retrieval.hard_negatives — both rank lists as nested-WITH
    CTE bodies, anti join via LEFT JOIN ... IS NULL, BM25-order re-rank."""
    from spatialflink_spark.operators.retrieval import (
        BM25_QUERY_MOD,
        HARDNEG_K,
        RRF_DEPTH,
    )

    k = HARDNEG_K if k is None else k
    lexsql = bm25_topk(k=RRF_DEPTH)
    semsql = cosine_topk_batch(k=RRF_DEPTH, query_mod=BM25_QUERY_MOD)
    return f"""
WITH lex AS ({lexsql}),
sem AS ({semsql}),
neg AS (
  SELECT l.q_id, l.doc_id, l.bm25, l.rank AS r_lex
  FROM lex l LEFT JOIN sem s ON l.q_id = s.q_id AND l.doc_id = s.vec_id
  WHERE s.q_id IS NULL
),
rr AS (
  SELECT q_id, doc_id, bm25, r_lex,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY r_lex ASC
         ) AS INT) AS rank
  FROM neg
)
SELECT q_id, rank, doc_id, bm25, r_lex FROM rr WHERE rank <= {k}
"""


def ann_recall(k: int | None = None) -> str:
    """Twin of similarity.batch_ann_recall — both batch rankers as
    nested-WITH CTE bodies, integer hit counts, one rounded division."""
    k = DEFAULT_K if k is None else k
    return f"""
WITH ex AS ({cosine_topk_batch(k=k)}),
an AS ({cosine_topk_batch_ann(k=k)}),
h AS (
  SELECT ex.q_id, CAST(count(*) AS BIGINT) AS _h
  FROM ex JOIN an ON ex.q_id = an.q_id AND ex.vec_id = an.vec_id
  GROUP BY ex.q_id
),
b AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY q_id)
SELECT b.q_id, b.n_exact,
       CAST(coalesce(h._h, 0) AS BIGINT) AS n_hit,
       round(CAST(coalesce(h._h, 0) AS DOUBLE) / b.n_exact, 6) AS recall
FROM b LEFT JOIN h ON b.q_id = h.q_id
"""


def temperature_mix() -> str:
    """Twin of mixing.temperature_mix_sample — integer div before the
    IEEE-pinned sqrt, same LCG keep-filter as source_mix."""
    from spatialflink_spark.operators.mixing import BP, TEMP_SCALE

    return f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_W}) AS BIGINT) AS n_w FROM documents
),
per_src AS (
  SELECT source, CAST(sum(n_w) AS BIGINT) AS src_toks FROM t GROUP BY source
),
mn AS (
  SELECT CAST(min(src_toks) AS BIGINT) AS min_toks
  FROM per_src WHERE src_toks > 0
),
rates AS (
  SELECT source,
         CAST(CASE WHEN src_toks = 0 THEN {BP} ELSE
           least({BP}, CAST(floor(sqrt(CAST(
             ({TEMP_SCALE} * min_toks) // src_toks AS DOUBLE))) AS INT))
         END AS INT) AS rate_bp
  FROM per_src CROSS JOIN mn
)
SELECT t.source, r.rate_bp, count(*) AS n_kept,
       CAST(sum(t.n_w) AS BIGINT) AS tok_kept
FROM t JOIN rates r USING (source)
WHERE (((t.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % {BP}
      < r.rate_bp
GROUP BY t.source, r.rate_bp
"""


def lsh_calibration() -> str:
    """Twin of dedup.lsh_calibration — the unthresholded pair statement as
    a nested-WITH CTE body, exact-integer decile bucketing."""
    return f"""
WITH p AS ({minhash_lsh_pairs(threshold=0.0)}),
b AS (
  SELECT least(9, CAST(floor(est_sim * 10) AS INT)) AS decile,
         CAST(round(est_sim * 1000000) AS BIGINT) AS _e,
         CAST(round(jaccard * 1000000) AS BIGINT) AS _j
  FROM p
)
SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(_e) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000), 6)
         AS mean_est,
       round(CAST(sum(_j) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000), 6)
         AS mean_jaccard
FROM b GROUP BY decile
"""


def bigram_fluency() -> str:
    """Twin of corpus.bigram_fluency — exact-integer conditional-probability
    sums over the shared bigram encoding (a * VOCAB_SIZE + b); `//` is
    DuckDB's floor division, matching Spark's `div` on the nonnegative
    operands."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import FLUENCY_SCALE

    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
bgx AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(_t)),
                i -> CAST(_t[i] AS BIGINT) * {VOCAB_SIZE} + _t[i + 1])) AS bg
  FROM t WHERE len(_t) >= 2
),
cab AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM bgx GROUP BY bg),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_a
  FROM (SELECT unnest(_t) AS tok FROM t) GROUP BY tok
),
p AS (
  SELECT b.doc_id, (c.c_ab * {FLUENCY_SCALE}) // u.c_a AS _p
  FROM bgx b JOIN cab c USING (bg) JOIN uni u ON b.bg // {VOCAB_SIZE} = u.tok
),
a AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(_p) AS BIGINT) AS fluency_sum
  FROM p GROUP BY doc_id
)
SELECT doc_id, n_bigrams, fluency_sum,
       fluency_sum // n_bigrams AS fluency_mean
FROM a
"""


def prototypicality(
    n_centroids: int | None = None,
    iters: int | None = None,
    drop_bp: int | None = None,
) -> str:
    """Twin of similarity.prototypicality — the shared Lloyd CTE chain,
    then per-cluster closeness ranks and the integer basis-point keep cut."""
    from spatialflink_spark.operators.similarity import (
        KM_CENTROIDS,
        KM_ITERS,
        PROTO_DROP_BP,
    )

    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    drop_bp = PROTO_DROP_BP if drop_bp is None else drop_bp
    ctes, final = _kmeans_ctes(n_centroids, iters)
    # the shared `assigned` CTE drops qv/distance; re-derive with d2 kept
    d = _km_duck_dist("v.qv", "c.cq")
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
ad AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT v.vec_id, c.cid, {d} AS d2,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {d}, c.cid) AS rn
    FROM q0 v CROSS JOIN {final} c
  ) WHERE rn = 1
),
r AS (
  SELECT vec_id, CAST(cid AS INT) AS cid, d2,
         CAST(row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS INT)
           AS rank_c,
         CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_c
  FROM ad
)
SELECT vec_id, cid, d2, rank_c,
       (rank_c > (n_c * {drop_bp}) // 10000) AS keep
FROM r
"""


def pq_topk_batch(
    k: int | None = None,
    m: int | None = None,
    n_cent: int | None = None,
    iters: int | None = None,
    dim: int = 64,
    query_mod: int | None = None,
) -> str:
    """Twin of similarity.pq_topk_batch — the pq_topk_adc chain generalized
    to the query table: codes over ALL vectors, one ADC distance row per
    (query, subspace, centroid), exact-bigint sums, per-query rank."""
    from spatialflink_spark.operators.similarity import (
        DEFAULT_K,
        PQ_ITERS,
        PQ_K,
        PQ_M,
        QUERY_MOD,
    )

    k = DEFAULT_K if k is None else k
    m = PQ_M if m is None else m
    n_cent = PQ_K if n_cent is None else n_cent
    iters = PQ_ITERS if iters is None else iters
    query_mod = QUERY_MOD if query_mod is None else query_mod
    sub = dim // m
    dist = _km_duck_dist
    all_ctes: list[str] = []
    code_sel, dt_sel = [], []
    for j in range(m):
        ctes, final = _pq_sub_ctes(j, sub, n_cent, iters)
        all_ctes += ctes
        code_sel.append(f"""
  SELECT vec_id, {j} AS j, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist('v.qv', 'c.cq')}, c.cid) AS rn
    FROM p{j}q0 v CROSS JOIN {final} c
  ) WHERE rn = 1""")
        dt_sel.append(f"""
  SELECT q.vec_id AS q_id, {j} AS j, c.cid, {dist('q.qv', 'c.cq')} AS d
  FROM p{j}q0 q CROSS JOIN {final} c
  WHERE q.vec_id % {query_mod} = 0""")
    cte_block = ",\n".join(all_ctes)
    codes = " UNION ALL ".join(code_sel)
    dtable = " UNION ALL ".join(dt_sel)
    return f"""
WITH {cte_block},
codes AS ({codes}),
dtable AS ({dtable}),
adc AS (
  SELECT d.q_id, c.vec_id, CAST(sum(d.d) AS BIGINT) AS adc
  FROM codes c JOIN dtable d ON c.j = d.j AND c.code = d.cid
  WHERE c.vec_id <> d.q_id
  GROUP BY d.q_id, c.vec_id
),
r AS (
  SELECT q_id, vec_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id ASC)
           AS rank
  FROM adc
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id, adc FROM r WHERE rank <= {k}
"""


def l2_topk_batch(k: int | None = None, query_mod: int | None = None) -> str:
    """Exact quantized-squared-L2 per-query rank — the direct-window golden
    for the engine's two-stage cut AND the recall basis inside
    pq_batch_recall."""
    from spatialflink_spark.operators.similarity import (
        DEFAULT_K,
        KM_QSCALE,
        QUERY_MOD,
    )

    k = DEFAULT_K if k is None else k
    query_mod = QUERY_MOD if query_mod is None else query_mod
    return f"""
WITH fq0 AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS q_id, v.vec_id, {_km_duck_dist('v.qv', 'q.qv')} AS d2
  FROM fq0 v JOIN fq0 q ON q.vec_id % {query_mod} = 0 AND v.vec_id <> q.vec_id
),
r AS (
  SELECT q_id, vec_id, d2,
         row_number() OVER (PARTITION BY q_id ORDER BY d2 ASC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id, d2 FROM r WHERE rank <= {k}
"""


def pq_batch_recall(k: int | None = None) -> str:
    """Twin of similarity.pq_batch_recall — both rankers as nested-WITH CTE
    bodies (the ann_recall shape), integer hit counts, one rounded
    division."""
    k = DEFAULT_K if k is None else k
    return f"""
WITH ex AS ({l2_topk_batch(k=k)}),
an AS ({pq_topk_batch(k=k)}),
h AS (
  SELECT ex.q_id, CAST(count(*) AS BIGINT) AS _h
  FROM ex JOIN an ON ex.q_id = an.q_id AND ex.vec_id = an.vec_id
  GROUP BY ex.q_id
),
b AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY q_id)
SELECT b.q_id, b.n_exact,
       CAST(coalesce(h._h, 0) AS BIGINT) AS n_hit,
       round(CAST(coalesce(h._h, 0) AS DOUBLE) / b.n_exact, 6) AS recall
FROM b LEFT JOIN h ON b.q_id = h.q_id
"""


def cardinality_kmv() -> str:
    """Twin of corpus.cardinality_kmv — the same 16 MinHash-family permuted
    minima and integer estimator over the shared shingle-hash stream."""
    from spatialflink_spark.operators.corpus import KMV_SPACE
    from spatialflink_spark.operators.dedup import MINHASH_A, MINHASH_B, N_HASHES

    mins = ",\n         ".join(
        f"min((h * {a} + {b}) % {KMV_SPACE}) AS _m{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    sum_m = " + ".join(f"_m{i}" for i in range(N_HASHES))
    return f"""
WITH hs0 AS (SELECT doc_id, {_duck_shingle_hashes()} AS _hs FROM documents),
hs AS (
  SELECT d.source, unnest(h0._hs) AS h
  FROM hs0 h0 JOIN documents d USING (doc_id)
),
sk AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_occurrences,
         {mins}
  FROM hs GROUP BY source
),
ex AS (
  SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS exact_distinct
  FROM hs GROUP BY source
),
est AS (
  SELECT source, n_occurrences,
         CAST({N_HASHES} AS BIGINT) * {KMV_SPACE}
           // greatest({sum_m}, 1) - 1 AS est_distinct
  FROM sk
)
SELECT e.source, e.n_occurrences, x.exact_distinct, e.est_distinct,
       abs(e.est_distinct - x.exact_distinct) * 10000 // x.exact_distinct
         AS err_bp
FROM est e JOIN ex x USING (source)
"""


def blocklist_filter() -> str:
    """Twin of text.blocklist_filter — same injection, same word-boundary
    IN-set count, same keep rule."""
    from spatialflink_spark.operators.text import BLOCKLIST, blocklist_inject_sql

    terms = ", ".join(f"'{t}'" for t in BLOCKLIST)
    return f"""
WITH d AS (SELECT doc_id, {blocklist_inject_sql()} AS txt FROM documents),
w AS (SELECT doc_id, {T.duck_words('txt')} AS _w FROM d)
SELECT doc_id,
       CAST(len(_w) AS BIGINT) AS n_words,
       CAST(len(list_filter(_w, x -> x IN ({terms}))) AS BIGINT) AS n_blocked,
       CAST(CASE WHEN len(list_filter(_w, x -> x IN ({terms}))) = 0
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM w
"""


def chunk_documents(width: int | None = None, stride: int | None = None) -> str:
    """Twin of text.chunk_documents — 1-based inclusive list slices match
    Spark's slice(arr, start, width); chunk_idx = (start-1) // stride."""
    from spatialflink_spark.operators.text import CHUNK_S, CHUNK_W

    width = CHUNK_W if width is None else width
    stride = CHUNK_S if stride is None else stride
    tok = T.duck_tokenize("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS _t FROM documents),
x AS (
  SELECT doc_id, _t, unnest(range(1, len(_t) + 1, {stride})) AS s
  FROM t WHERE len(_t) >= 1
),
c AS (
  SELECT doc_id,
         CAST((s - 1) // {stride} AS INT) AS chunk_idx,
         CAST(s - 1 AS BIGINT) AS "offset",
         _t[s : s + {width} - 1] AS _c
  FROM x
)
SELECT doc_id, chunk_idx, "offset",
       CAST(len(_c) AS BIGINT) AS n_chunk_tok,
       {T.duck_tok_checksum('_c')} AS chunk_hash
FROM c
"""


def bpe_merges(n_merges: int | None = None) -> str:
    """Twin of corpus.bpe_merges. The engine merges per row with a
    left-to-right struct fold; DuckDB v1.0's list_reduce cannot carry a
    struct accumulator, so the twin uses the RELATIONAL form of the same
    greedy rule: adjacent-match flags via lead(), gaps-and-islands
    grouping of consecutive matches (consecutive matches imply
    tok_a = tok_b, so islands are exactly the a-runs), take every other
    match from each island's start, drop the consumed successor via
    lag(taken). Equivalence of the two forms is what the gate proves."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import BPE_MERGES, BPE_PAIR_BASE

    n_merges = BPE_MERGES if n_merges is None else n_merges
    tok = T.duck_tokenize("text")
    # AS MATERIALIZED on every multi-consumer CTE: t{r} feeds p{r+1},
    # x{r+1} AND the stats row; top{r} is referenced three times per
    # round — inlined, the chain re-evaluates ~3^rounds times (measured
    # as a >120s hang at sf0.001 before materialization)
    ctes = [
        f"t0 AS MATERIALIZED (SELECT doc_id, list_transform({tok},"
        " x -> CAST(x AS BIGINT)) AS _t FROM documents)"
    ]
    stat_rows = []
    for r in range(1, n_merges + 1):
        new_id = VOCAB_SIZE + r - 1
        prev = f"t{r - 1}"
        ctes.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(_t)),
                i -> _t[i] * {BPE_PAIR_BASE} + _t[i + 1])) AS bg
  FROM {prev} WHERE len(_t) >= 2
)""")
        ctes.append(
            f"c{r} AS (SELECT bg, CAST(count(*) AS BIGINT) AS n_pairs "
            f"FROM p{r} GROUP BY bg)"
        )
        ctes.append(
            f"top{r} AS MATERIALIZED (SELECT bg // {BPE_PAIR_BASE} AS a,"
            f" bg % {BPE_PAIR_BASE} AS b, n_pairs"
            f" FROM c{r} ORDER BY n_pairs DESC, bg ASC LIMIT 1)"
        )
        ctes.append(
            f"x{r} AS (SELECT doc_id, unnest(range(1, len(_t) + 1)) AS pos,"
            f" unnest(_t) AS tok FROM {prev})"
        )
        ctes.append(f"""m{r} AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok = (SELECT a FROM top{r})
               AND lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                   = (SELECT b FROM top{r})
              THEN 1 ELSE 0 END AS m
  FROM x{r}
)""")
        ctes.append(
            f"g{r} AS (SELECT *, pos - row_number() OVER"
            f" (PARTITION BY doc_id, m ORDER BY pos) AS grp FROM m{r})"
        )
        ctes.append(f"""s{r} AS (
  SELECT *, CASE WHEN m = 1 AND (pos - min(pos) OVER
                  (PARTITION BY doc_id, m, grp)) % 2 = 0
                 THEN 1 ELSE 0 END AS taken
  FROM g{r}
)""")
        ctes.append(f"""o{r} AS (
  SELECT doc_id, pos,
         CASE WHEN taken = 1 THEN CAST({new_id} AS BIGINT)
              WHEN lag(taken) OVER (PARTITION BY doc_id ORDER BY pos) = 1
              THEN NULL
              ELSE CAST(tok AS BIGINT) END AS out
  FROM s{r}
)""")
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT doc_id, list(out ORDER BY pos) AS _t"
            f" FROM o{r} WHERE out IS NOT NULL GROUP BY doc_id)"
        )
        stat_rows.append(
            f"SELECT CAST({r} AS INT) AS rank, (SELECT a FROM top{r}) AS tok_a,"
            f" (SELECT b FROM top{r}) AS tok_b,"
            f" CAST({new_id} AS BIGINT) AS new_id,"
            f" (SELECT n_pairs FROM top{r}) AS n_pairs,"
            f" (SELECT CAST(sum(len(_t)) AS BIGINT) FROM t{r})"
            " AS total_tok_after"
        )
    cte_block = ",\n".join(ctes)
    union = "\nUNION ALL\n".join(stat_rows)
    return f"WITH {cte_block}\n{union}"


def cluster_quality_profile(
    n_centroids: int | None = None, iters: int | None = None
) -> str:
    """Twin of similarity.cluster_quality_profile — the shared Lloyd CTE
    chain's `assigned` relation joined to the nested quality_filter
    statement (the source_card pattern), per-cid integerized means."""
    from spatialflink_spark.operators.similarity import KM_CENTROIDS, KM_ITERS

    n_centroids = KM_CENTROIDS if n_centroids is None else n_centroids
    iters = KM_ITERS if iters is None else iters
    ctes, _ = _kmeans_ctes(n_centroids, iters)
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
qf AS ({quality_filter()}),
q AS (
  SELECT doc_id AS vec_id, n_words,
         CAST(round(quality * 1000000) AS BIGINT) AS _q, keep
  FROM qf
),
j AS (SELECT a.cid, q.n_words, q._q, q.keep FROM assigned a JOIN q USING (vec_id))
SELECT CAST(cid AS INT) AS cid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       round(CAST(sum(_q) AS DOUBLE) / (count(*) * 1000000), 6) AS mean_quality,
       round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS keep_rate
FROM j GROUP BY cid
"""


def media_dedup() -> str:
    """Twin of multimodal.media_dedup — the payload is the document's
    utf-8 bytes by construction (synthesize_media), so md5(text) hashes
    the same bytes Spark's md5(payload binary) does."""
    return """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       md5(text) AS payload_hash,
       CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
            AS INT) AS dup_rank
FROM documents
"""

"""Text-analysis operators for training-data pipelines.

First-class large-scale pipeline ops (not in the reference, which is a
spatial engine — these are the token-domain equivalents a 100 TB training
corpus needs): language ID, quality scoring, token counting, document
fingerprinting. All pure built-in column expressions (whole-stage codegen;
zero Python), each with a bit-identical DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialflink_spark.config import HASH_MOD, VOCAB_SIZE
from spatialflink_spark.functions import tokens as T

# deterministic mini stopword profiles; priority order breaks ties
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for"),
    "de": ("der", "die", "das", "und", "zu", "ist", "ein"),
    "es": ("el", "la", "de", "y", "que", "en", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "est"),
}
LANG_ORDER = ("en", "de", "es", "fr")


def _in_list(var: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"{var} IN ({lst})"


def lang_score_sql(words_expr: str, lang: str, *, size_fn: str, filter_fn: str) -> str:
    """score = stopword hits / word count (rounded) — same string for both
    dialects modulo function names (size/filter vs len/list_filter)."""
    prof = LANG_PROFILES[lang]
    # cast(... as double): `* 1.0` would make Spark produce DECIMAL (the
    # driver's value hash is dtype-sensitive); cast works in both dialects
    return (
        f"round(cast({size_fn}({filter_fn}({words_expr}, w -> {_in_list('w', prof)})) "
        f"as double) / greatest({size_fn}({words_expr}), 1), 6)"
    )


def pred_lang_sql() -> str:
    """argmax over s_en/s_de/s_es/s_fr with LANG_ORDER tie priority."""
    return (
        "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' "
        "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END"
    )


# weighted quality heuristic over (n_words, n_chars, stop_ratio, digit_ratio)
# in pure double math — the same string runs in Spark SQL and DuckDB, so both
# sides execute identical IEEE operations in identical order
QUALITY_SQL = (
    "round(0.3 * least(cast(n_words as double) / 100.0, cast(1.0 as double)) "
    "+ 0.3 * stop_ratio "
    "+ 0.2 * (cast(1.0 as double) - digit_ratio) "
    "+ 0.2 * least(cast(n_chars as double) / greatest(n_words, 1) / 8.0, "
    "cast(1.0 as double)), 6)"
)


def lang_id(docs: DataFrame) -> DataFrame:
    from spatialflink_spark.session import spread

    # stage the word array once — the four scores reference it eight times
    staged = spread(docs).select(
        "doc_id", F.expr(T.spark_words("text")).alias("_w")
    )
    d = staged.select(
        "doc_id",
        *[
            F.expr(
                lang_score_sql("_w", lg, size_fn="size", filter_fn="filter")
            ).alias(f"s_{lg}")
            for lg in LANG_ORDER
        ],
    )
    return d.select("doc_id", "s_en", "s_de", "s_es", "s_fr",
                    F.expr(pred_lang_sql()).alias("pred_lang"))


QUALITY_COLS = ("n_words", "n_chars", "stop_ratio", "digit_ratio", "quality")


def with_quality(docs: DataFrame, words_col: str | None = None) -> DataFrame:
    """Append the quality columns (n_words, n_chars, stop_ratio,
    digit_ratio, quality) to `docs`, keeping every input column — the
    shared kernel behind quality_score and the selection / keep-best ops
    that need quality NEXT TO other columns (source, component) without a
    re-scan self-join. Callers must project away clashing input columns
    first (the raw documents table already carries an `n_chars`).

    The word array (lower + regex split + filter) is STAGED once and
    referenced by n_words and the stop-ratio score — inlined, it evaluated
    three times per row (the lambda-CSE rule: nothing dedups repeated
    subexpressions across these interpreted chains). Callers that already
    hold a staged words column pass its name as `words_col` to share it."""
    clash = set(docs.columns) & set(QUALITY_COLS)
    assert not clash, f"with_quality: project away clashing columns {clash}"
    if words_col is None:
        staged = docs.select(
            "*", F.expr(T.spark_words("text")).alias("_wq")
        )
        w = "_wq"
    else:
        staged, w = docs, words_col
    d = staged.select(
        "*",
        F.expr(f"size({w})").alias("n_words"),
        F.length("text").alias("n_chars"),
        F.expr(lang_score_sql(w, "en", size_fn="size", filter_fn="filter")).alias(
            "stop_ratio"
        ),
        F.expr(
            "round(cast(length(regexp_replace(text, '[^0-9]', '')) as double) / "
            "greatest(length(text), 1), 6)"
        ).alias("digit_ratio"),
    )
    out = d.select("*", F.expr(QUALITY_SQL).alias("quality"))
    if words_col is None:
        out = out.drop("_wq")
    return out


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / stopword / digit-ratio quality heuristic, weighted and
    rounded — the standard cheap pre-filter for corpus curation."""
    from spatialflink_spark.session import spread

    return with_quality(spread(docs).select("doc_id", "text")).select(
        "doc_id",
        "n_words",
        "n_chars",
        "stop_ratio",
        "digit_ratio",
        "quality",
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters runs / digit runs /
    single punctuation) + engine token count."""
    from spatialflink_spark.session import spread

    return spread(docs).select(
        "doc_id",
        F.expr("size(split(trim(text), '[ ]+'))").alias("n_ws_tokens"),
        F.expr(
            "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        ).alias("n_bpe_tokens"),
        F.expr(f"size({T.spark_tokenize('text')})").alias("n_engine_tokens"),
    )


def fingerprint(docs: DataFrame, k: int = 3, mod: int = 7) -> DataFrame:
    """Mod-p shingle fingerprint (winnowing-lite): keep shingle hashes
    h % mod == 0, sorted; emit count + order-sensitive checksum. Two docs
    sharing most shingles share most fingerprint hashes.

    Staged through intermediate columns so the shingle/hash pipeline
    evaluates once per row (see dedup.with_shingle_hashes)."""
    from spatialflink_spark.operators.dedup import with_shingle_hashes

    fp = with_shingle_hashes(docs, k).select(
        "doc_id",
        F.expr(f"array_sort(filter(_hs, h -> h % {mod} = 0))").alias("_fp"),
    )
    return fp.select(
        "doc_id",
        F.expr("size(_fp)").alias("n_fp"),
        F.expr(
            f"aggregate(_fp, cast(0 as bigint), (a, h) -> (a*131 + h) % {HASH_MOD})"
        ).alias("fp_checksum"),
    )


REP_NGRAM = 2  # bigram — the Gopher "duplicate 2-gram fraction" rule width


def gram_id_expr(arr: str, i: str, n: int, dialect: str) -> str:
    """Base-VOCAB_SIZE packed id of the n-gram starting at 1-based index
    `i` of token array `arr` — same bigint in both dialects (max value
    VOCAB_SIZE^n, < 2^63 for n <= 3). Spark indexes via element_at, DuckDB
    via list_extract (both 1-based)."""
    at = "element_at" if dialect == "spark" else "list_extract"
    e = f"CAST({at}({arr}, {i}) AS BIGINT)"
    for j in range(1, n):
        e = f"({e} * {VOCAB_SIZE} + {at}({arr}, {i} + {j}))"
    return e


# longest equal-run length of a SORTED array — per-row max multiplicity
# (prev = -1 sentinel: gram ids are nonnegative)
_MAX_RUN = (
    "aggregate({arr}, "
    "named_struct('prev', cast(-1 as bigint), 'run', cast(0 as bigint), "
    "'best', cast(0 as bigint)), "
    "(a, x) -> named_struct('prev', x, "
    "'run', if(x = a.prev, a.run + 1, cast(1 as bigint)), "
    "'best', greatest(a.best, if(x = a.prev, a.run + 1, cast(1 as bigint)))), "
    "a -> a.best)"
)


def with_repetition(df: DataFrame, tokens_col: str, n: int = REP_NGRAM) -> DataFrame:
    """Append n_grams / dup_gram_frac / top_gram_frac computed PER ROW from
    an existing token-array column — no shuffle at all: duplicate fraction
    via array_distinct, max multiplicity via a sorted-array run scan
    (aggregate with struct state). The explode -> groupBy(doc_id, gram)
    alternative re-shuffles the entire corpus times the gram factor; at
    100 TB that shuffle IS the job, and nothing about the statistic needs
    it (every gram of a doc is already co-resident in its row). Rows with
    fewer than n tokens are dropped (no grams). Staged through
    intermediate selects per the lambda-CSE rule."""
    d = df.where(F.expr(f"size({tokens_col}) >= {n}"))
    gram_arr = (
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> {gram_id_expr(tokens_col, 'i', n, 'spark')})"
    )
    d = d.select("*", F.expr(gram_arr).alias("_g"))
    d = d.select("*", F.expr("array_sort(_g)").alias("_gs"))
    d = d.select("*", F.expr(_MAX_RUN.format(arr="_gs")).alias("_mx"))
    return d.select(
        *df.columns,
        F.expr("cast(size(_g) as bigint)").alias("n_grams"),
        F.expr(
            "round(cast(1.0 as double) - "
            "cast(size(array_distinct(_g)) as double) / size(_g), 6)"
        ).alias("dup_gram_frac"),
        F.expr("round(cast(_mx as double) / size(_g), 6)").alias("top_gram_frac"),
    )


def doc_repetition(docs: DataFrame, n: int = REP_NGRAM) -> DataFrame:
    """Intra-document repetition score (the Gopher-style repetition rule:
    documents whose n-grams are mostly repeats of themselves are low-quality
    boilerplate/spam): per doc, the fraction of token n-grams that are
    duplicate occurrences and the share of the single most frequent n-gram.
    Entirely per-row (with_repetition) — zero shuffles; the DuckDB oracle
    computes the same values through an explode -> GROUP BY plan, pinning
    the per-row rewrite to the relational definition.
    Output: doc_id, n_grams, dup_gram_frac, top_gram_frac."""
    from spatialflink_spark.session import spread

    toks = spread(docs).select(
        "doc_id", F.expr(T.spark_tokenize("text")).alias("_t")
    )
    return with_repetition(toks, "_t", n).select(
        "doc_id", "n_grams", "dup_gram_frac", "top_gram_frac"
    )


def token_diversity(docs: DataFrame) -> DataFrame:
    """Per-doc lexical diversity: type-token ratio and Simpson diversity
    index (1 - sum(c^2)/n^2) over engine token counts. Simpson rather than
    Shannon entropy ON PURPOSE: +,-,*,/ are IEEE-754-pinned so both engines
    compute bit-identical doubles, while log() is implementation-defined
    (JVM vs libm can differ 1 ulp — enough to flip a round(,6) boundary).
    Output: doc_id, n_tok, n_distinct, ttr, simpson."""
    from spatialflink_spark.session import spread

    tok = (
        spread(docs)
        .select("doc_id", F.explode(F.expr(T.spark_tokenize("text"))).alias("tok"))
    )
    per = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("_c"))
    agg = per.groupBy("doc_id").agg(
        F.expr("cast(sum(_c) as bigint)").alias("n_tok"),
        F.expr("cast(count(1) as bigint)").alias("n_distinct"),
        F.expr("cast(sum(_c * _c) as bigint)").alias("_ss"),
    )
    return agg.select(
        "doc_id",
        "n_tok",
        "n_distinct",
        F.expr("round(cast(n_distinct as double) / n_tok, 6)").alias("ttr"),
        F.expr(
            "round(cast(1.0 as double) - cast(_ss as double) / n_tok / n_tok, 6)"
        ).alias("simpson"),
    )


# C4/Gopher-style filter thresholds (calibrated so every rule fires on the
# synthetic corpus: words p10=18, rep p90=0.065, quality p10=0.41)
QF_MIN_WORDS = 15
QF_MAX_WORDS = 1000
QF_MAX_REP = 0.08
QF_MIN_QUALITY = 0.45
QF_LANGS = ("en",)

# one condition string per rule, valid verbatim in BOTH dialects (they
# reference the already-aliased columns n_words / dup_gram_frac / quality /
# pred_lang)
QF_CONDS: dict[str, str] = {
    "pass_len": f"(n_words >= {QF_MIN_WORDS} AND n_words <= {QF_MAX_WORDS})",
    "pass_rep": f"(dup_gram_frac <= {QF_MAX_REP})",
    "pass_quality": f"(quality >= {QF_MIN_QUALITY})",
    "pass_lang": f"(pred_lang IN ({', '.join(repr(lg) for lg in QF_LANGS)}))",
}
QF_KEEP = " AND ".join(QF_CONDS.values())


def qf_flag_sql(cond: str) -> str:
    return f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS INT)"


def with_quality_filter(df: DataFrame) -> DataFrame:
    """Append the composed C4/Gopher-style keep/drop verdict to a
    (doc_id, text, ...) relation — ONE per-row pass, ZERO shuffles: length
    rule + repetition rule (per-row with_repetition) + quality-score rule +
    language rule, every signal computed from the same scan. The shared
    kernel behind the batch gate query and the streaming ingest face
    (stateless -> trivially streaming-safe). Rows with < REP_NGRAM tokens
    are dropped with the repetition stage (they cannot pass the length rule
    anyway). Appends: n_words, dup_gram_frac, quality, pred_lang,
    pass_len, pass_rep, pass_quality, pass_lang, keep."""
    # STAGE the word array once for the whole composition: the quality
    # kernel, the tokenizer and the four language scores all consume it —
    # inlined (the r5 form), the lower+split+filter chain evaluated ~12x
    # per row across these expressions.
    staged = df.select("*", F.expr(T.spark_words("text")).alias("_w"))
    base = with_quality(staged, words_col="_w")
    base = base.select("*", F.expr(T.spark_tokenize_words("_w")).alias("_t"))
    base = base.select(
        "*",
        *[
            F.expr(
                lang_score_sql("_w", lg, size_fn="size", filter_fn="filter")
            ).alias(f"s_{lg}")
            for lg in LANG_ORDER
        ],
    )
    base = base.select("*", F.expr(pred_lang_sql()).alias("pred_lang"))
    rep = with_repetition(base, "_t")
    flagged = rep.select(
        "*", *[F.expr(qf_flag_sql(c)).alias(name) for name, c in QF_CONDS.items()]
    )
    return flagged.select(
        *df.columns,
        "n_words",
        "dup_gram_frac",
        "quality",
        "pred_lang",
        *QF_CONDS.keys(),
        F.expr(qf_flag_sql(QF_KEEP)).alias("keep"),
    )


def quality_filter(docs: DataFrame) -> DataFrame:
    """Composed document filter — the standard curation pre-filter chain
    (C4's length/lang rules + Gopher's repetition rule + the weighted
    quality heuristic) as one declarative verdict table.
    Output: doc_id, n_words, dup_gram_frac, quality, pred_lang,
    pass_len, pass_rep, pass_quality, pass_lang, keep."""
    from spatialflink_spark.session import spread

    return with_quality_filter(spread(docs).select("doc_id", "text")).drop("text")


# ---------------------------------------------------------------------------
# PII redaction — the scrubbing pass every public-corpus pipeline runs
# (emails / phone numbers / IPv4 addresses, cf. the C4 and BigScience ROOTS
# cleaning recipes). The synthetic corpus carries no real PII, so the gate
# INJECTS deterministic entities in-plan (the same trick csv_ingest uses for
# malformed lines) — the redaction kernel is exercised on text where the
# expected counts are provable from doc_id alone.
#
# Regexes are written in the RE2 ∩ java.util.regex portable subset: no
# backslash classes (character classes like [0-9] and [.] instead), no
# anchors, no backrefs — the same pattern string runs identically in Spark
# (Java regex) and DuckDB (RE2).
PII_EMAIL_RE = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[a-z]"  # (?i): Java/RE2/python alike
PII_IP_RE = "[0-9]{1,3}([.][0-9]{1,3}){3}"
PII_PHONE_RE = "555-[0-9]{3}-[0-9]{4}"


def pii_inject_sql(str_t: str) -> str:
    """Deterministic PII injection: docs with doc_id % 3 == 0 get an email,
    % 5 == 0 a phone, % 7 == 0 an IPv4 (doc 0 gets all three). `str_t` is
    the dialect's string type name ('string' for Spark, 'varchar' for
    DuckDB) — everything else is shared SQL."""
    c = f"cast(doc_id as {str_t})"
    return (
        "concat(text,"
        f" CASE WHEN doc_id % 3 = 0 THEN concat(' mail user', {c},"
        " '@example.com') ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN concat(' call 555-',"
        f" lpad(cast(doc_id % 1000 as {str_t}), 3, '0'), '-',"
        f" lpad(cast(doc_id % 10000 as {str_t}), 4, '0')) ELSE '' END,"
        " CASE WHEN doc_id % 7 = 0 THEN concat(' host 10.',"
        f" cast(doc_id % 256 as {str_t}), '.', cast(doc_id % 250 as {str_t}),"
        f" '.', cast(doc_id % 97 as {str_t})) ELSE '' END)"
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """Count and redact PII entities (email -> <EMAIL>, IPv4 -> <IP>,
    phone -> <PHONE>) over the injected text. Pure per-row regex codegen —
    zero shuffles, trivially scale-safe; the redacted text is graded by its
    portable rolling hash + length so the oracle never ships long strings.
    Output: doc_id, n_emails, n_ips, n_phones, n_pii, red_len, red_hash."""
    from spatialflink_spark.session import spread

    d = spread(docs).select(
        "doc_id", F.expr(pii_inject_sql("string")).alias("txt")
    )
    counted = d.select(
        "doc_id",
        "txt",
        F.expr(
            f"size(regexp_extract_all(txt, '{PII_EMAIL_RE}', 0))"
        ).cast("bigint").alias("n_emails"),
        F.expr(
            f"size(regexp_extract_all(txt, '{PII_IP_RE}', 0))"
        ).cast("bigint").alias("n_ips"),
        F.expr(
            f"size(regexp_extract_all(txt, '{PII_PHONE_RE}', 0))"
        ).cast("bigint").alias("n_phones"),
    )
    red = counted.select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        F.expr(
            f"regexp_replace(regexp_replace(regexp_replace(txt,"
            f" '{PII_EMAIL_RE}', '<EMAIL>'), '{PII_IP_RE}', '<IP>'),"
            f" '{PII_PHONE_RE}', '<PHONE>')"
        ).alias("red"),
    )
    return red.select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        F.expr("n_emails + n_ips + n_phones").alias("n_pii"),
        F.length("red").cast("bigint").alias("red_len"),
        F.expr(T.spark_str_hash("red")).alias("red_hash"),
    )


# ---------------------------------------------------------------------------
# Blocklist filtering — the C4 "bad words" page filter: any document
# containing a blocklisted term is dropped outright. The synthetic corpus
# contains no real blocklist terms, so the gate INJECTS deterministic
# sentinels in-plan (the pii_redact trick) — the filter kernel is exercised
# on text where the expected counts are provable from doc_id alone.
BLOCKLIST = ("zzxalpha", "zzxbeta", "zzxgamma")


def blocklist_inject_sql() -> str:
    """Deterministic sentinel injection: doc_id % 4 == 1 gets term 0,
    % 6 == 2 gets term 1 twice, % 9 == 5 gets term 2 — same string in both
    dialects."""
    return (
        "concat(text,"
        f" CASE WHEN doc_id % 4 = 1 THEN ' {BLOCKLIST[0]}' ELSE '' END,"
        f" CASE WHEN doc_id % 6 = 2 THEN ' {BLOCKLIST[1]} and {BLOCKLIST[1]}'"
        " ELSE '' END,"
        f" CASE WHEN doc_id % 9 = 5 THEN ' {BLOCKLIST[2]}.' ELSE '' END)"
    )


def blocklist_filter(docs: DataFrame) -> DataFrame:
    """C4-style blocklist page filter: count blocklisted WORD occurrences
    (word-boundary exact, not substring — 'class' never trips an 'ass'
    entry, the classic blocklist footgun) and keep only documents with
    zero hits. Pure per-row codegen over the word split — zero shuffles,
    trivially scale-safe; at a real deployment the blocklist is a few
    thousand terms riding a broadcast IN-set exactly like this literal.
    Output: doc_id, n_words, n_blocked, keep."""
    from spatialflink_spark.session import spread

    d = spread(docs).select(
        "doc_id", F.expr(blocklist_inject_sql()).alias("txt")
    )
    w = T.spark_words("txt")
    d = d.select("doc_id", F.expr(w).alias("_w"))
    return d.select(
        "doc_id",
        F.expr("cast(size(_w) as bigint)").alias("n_words"),
        F.expr(
            f"cast(size(filter(_w, x -> {_in_list('x', BLOCKLIST)})) as bigint)"
        ).alias("n_blocked"),
    ).select(
        "doc_id",
        "n_words",
        "n_blocked",
        F.expr("CAST(CASE WHEN n_blocked = 0 THEN 1 ELSE 0 END AS INT)").alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------------------
# Context-window chunking — the slicing step every RAG index and fixed-
# context pretraining run applies: overlapping fixed-size token windows
# with provenance (doc, offset) and an order-sensitive checksum so exact
# reconstruction is gradable without shipping token arrays.
CHUNK_W = 128   # window width in tokens
CHUNK_S = 96    # stride (32-token overlap)


def chunk_documents(
    docs: DataFrame, width: int = CHUNK_W, stride: int = CHUNK_S
) -> DataFrame:
    """Slice each document's token sequence into overlapping fixed-width
    chunks: starts at 1, 1+stride, 1+2*stride, ... while start <= n_tok
    (every token is covered; the last chunk may be short). Pure per-row
    work: tokenize once (materialized before the explode — the CLAUDE.md
    generate-amplification invariant), then slice/checksum per chunk —
    the only shuffle is whatever the caller does next.
    Output: doc_id, chunk_idx, offset, n_chunk_tok, chunk_hash."""
    from spatialflink_spark.session import spread

    toks = (
        spread(docs)
        .select("doc_id", F.expr(T.spark_tokenize("text")).alias("_t"))
        .where(F.expr("size(_t) >= 1"))
        .localCheckpoint(eager=False)
    )
    chunks = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(_t), {stride}),"
            f" s -> slice(_t, s, {width}))"
        ).alias("_chunks"),
    ).localCheckpoint(eager=False)
    x = chunks.select(
        "doc_id", F.posexplode("_chunks").alias("chunk_idx", "_c")
    )
    return x.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.expr(f"cast(chunk_idx * {stride} as bigint)").alias("offset"),
        F.expr("cast(size(_c) as bigint)").alias("n_chunk_tok"),
        F.expr(T.spark_tok_checksum("_c")).alias("chunk_hash"),
    )

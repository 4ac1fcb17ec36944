"""DuckDB oracle SQL for the corpus-level operators (dedup, similarity,
text quality, multimodal metadata) over the ``documents`` / ``embeddings``
parquet tables. Generated from the same constants as the Spark builders
(functions.hashing, operators.similarity) so the two sides cannot drift.
"""

from __future__ import annotations

from dygiepp_spark.functions.hashing import (
    MINHASH_PERMS,
    PERM_MOD,
    MOD,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    char_hash_sql,
)
from dygiepp_spark.functions.lexicons import STOPWORDS, sql_in
from dygiepp_spark.operators.similarity import (
    N_HYPERPLANES,
    QUANT_SCALE,
    fixed_centroid,
    hyperplane,
)
from dygiepp_spark.operators.text_quality import PROFILE_SIZE, WINNOW_WINDOW

_H_TEXT = char_hash_sql("text", "duckdb")
_H_TOKEN = char_hash_sql("token", "duckdb")
_H_SHINGLE = char_hash_sql("shingle", "duckdb")

_PERM_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PERMS)
)

SHINGLES_CTE = f"""
toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(text, ' ')) AS token,
         CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos
  FROM documents
),
sh2 AS (
  SELECT doc_id,
         token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
  FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, {_H_SHINGLE} AS shash
  FROM sh2 WHERE shingle IS NOT NULL
),
perms AS (SELECT * FROM (VALUES {_PERM_VALUES}) AS p(perm_ix, a, b)),
minsig AS (
  SELECT s.doc_id, CAST(p.perm_ix AS BIGINT) AS perm_ix,
         MIN((p.a * s.shash + p.b) % {PERM_MOD}) AS minhash
  FROM shingles s CROSS JOIN perms p
  GROUP BY s.doc_id, p.perm_ix
),
bands AS (
  SELECT doc_id, perm_ix // {ROWS_PER_BAND} AS band_ix,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT), list(minhash ORDER BY perm_ix)),
           (acc, x) -> (acc * 31 + x) % {MOD}) AS band_hash
  FROM minsig GROUP BY doc_id, perm_ix // {ROWS_PER_BAND}
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band_ix, band_hash) AS bucket_size
  FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sized a JOIN sized b
    ON a.band_ix = b.band_ix AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id AND a.bucket_size <= 64 AND b.bucket_size <= 64
),
jacc AS (
  SELECT c.doc_a, c.doc_b,
         CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         CAST(na.n_sh + nb.n_sh - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union
  FROM cand c
  LEFT JOIN (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
    FROM cand p
    JOIN shingles sa ON sa.doc_id = p.doc_a
    JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shash = sa.shash
    GROUP BY p.doc_a, p.doc_b
  ) i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id) na ON na.doc_id = c.doc_a
  JOIN (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id) nb ON nb.doc_id = c.doc_b
)
"""


def _ballot(b: int) -> str:
    return (
        f"SUM(CASE WHEN (({2 * b + 3} * thash) % {MOD}) % 2 = 0 "
        f"THEN 1 ELSE -1 END) AS b{b}"
    )


SIMHASH_SQL = f"""WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
tokh AS (SELECT doc_id, {_H_TOKEN} AS thash FROM toks),
ballots AS (
  SELECT doc_id, {', '.join(_ballot(b) for b in range(SIMHASH_BITS))}
  FROM tokh GROUP BY doc_id
)
SELECT doc_id,
       CAST({' + '.join(f'(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)' for b in range(SIMHASH_BITS))} AS BIGINT) AS simhash
FROM ballots"""

HAMMING_PAIRS_SQL = f"""WITH sim AS ({SIMHASH_SQL}),
blocked AS (SELECT doc_id, simhash, simhash % 256 AS block FROM sim)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM blocked a JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""

_QUANT = f"list_transform(embedding, x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT))"


def _hyperplane_sql(j: int, dim: int = 64) -> str:
    vals = ", ".join(str(v) for v in hyperplane(j, dim))
    return f"CAST(list_dot_product(qv, [{vals}]) AS BIGINT)"


EMBED_TOPK_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv FROM embeddings
)
SELECT qid AS vec_id, CAST(rn AS BIGINT) AS rank, nid AS neighbor_id, dot
FROM (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST(list_dot_product(a.qv, b.qv) AS BIGINT) DESC, b.vec_id) AS rn
  FROM q a JOIN q b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 32
)
WHERE rn <= 3"""

EMBED_COSINE_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv,
         CAST(list_dot_product({_QUANT}, {_QUANT}) AS BIGINT) AS n2
  FROM embeddings
)
SELECT qid AS vec_id, CAST(rn AS BIGINT) AS rank, nid AS neighbor_id, dot,
       nn2 AS neighbor_norm2
FROM (
  SELECT a.vec_id AS qid, b.vec_id AS nid, b.n2 AS nn2,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
                    / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) DESC,
                    b.vec_id) AS rn
  FROM q a JOIN q b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 32
)
WHERE rn <= 3"""

# fixed-centroid IVF (similarity.ivf_topk_fixed): centroids from the same
# deterministic generator, so assignment (argmax dot, lowest-list ties),
# nprobe probing and in-list exact search are pure int64 algebra on both
# engines. Defaults mirror the Spark builder: 16 lists, nprobe 4, k 3,
# 32 queries.
_IVF_CENTROID_ROWS = ", ".join(
    f"({j}, [{', '.join(str(v) for v in fixed_centroid(j, 64))}])" for j in range(16)
)

EMBED_IVF_FIXED_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv FROM embeddings
),
cents AS (
  SELECT CAST(list_id AS BIGINT) AS list_id,
         list_transform(cv, x -> CAST(x AS BIGINT)) AS cv
  FROM (VALUES {_IVF_CENTROID_ROWS}) AS c(list_id, cv)
),
cscored AS (
  SELECT q.vec_id, cents.list_id,
         CAST(list_dot_product(q.qv, cents.cv) AS BIGINT) AS cdot
  FROM q CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cdot DESC, list_id) AS rn
    FROM cscored) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cdot DESC, list_id) AS rn
    FROM cscored WHERE vec_id < 32) WHERE rn <= 4
),
cand AS (
  SELECT p.qid, a.vec_id AS nid,
         CAST(list_dot_product(qq.qv, nq.qv) AS BIGINT) AS dot
  FROM probes p
  JOIN assigned a ON a.list_id = p.list_id
  JOIN q nq ON nq.vec_id = a.vec_id
  JOIN q qq ON qq.vec_id = p.qid
  WHERE a.vec_id != p.qid
)
SELECT qid AS vec_id, CAST(rn AS BIGINT) AS rank, nid AS neighbor_id, dot
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
  FROM cand
)
WHERE rn <= 3"""

# k-means IVF (similarity.ivf_topk): the 2-iteration Lloyd loop UNROLLED —
# seeds are the 16 lowest vec_ids, each iteration is an argmax assignment
# (ties → lowest list_id) plus a floor-of-mean integer centroid update, so
# the whole quantizer is deterministic int64/IEEE-exact algebra. Mirrors
# the Spark operator exactly: the search probes the FINAL centroids
# (post-update) while corpus lists carry the LAST assignment.
def _lloyd_iter(i: int) -> str:
    prev = "cents0" if i == 1 else f"cents{i - 1}"
    return f""",
scored{i} AS (
  SELECT q.vec_id, c.list_id,
         CAST(list_dot_product(q.qv, c.cv) AS BIGINT) AS cdot
  FROM q CROSS JOIN {prev} c
),
assign{i} AS (
  SELECT vec_id, list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cdot DESC, list_id) AS rn
    FROM scored{i}) WHERE rn = 1
),
cents{i} AS (
  SELECT list_id, list(m ORDER BY d) AS cv FROM (
    SELECT a.list_id, dims.d, CAST(floor(avg(dims.val)) AS BIGINT) AS m
    FROM assign{i} a
    JOIN q ON q.vec_id = a.vec_id,
    LATERAL (SELECT unnest(q.qv) AS val,
                    generate_subscripts(q.qv, 1) AS d) dims
    GROUP BY a.list_id, dims.d
  ) GROUP BY list_id
)"""


EMBED_IVF_KMEANS_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv FROM embeddings
),
cents0 AS (
  SELECT vec_id AS list_id, qv AS cv FROM q ORDER BY vec_id LIMIT 16
){_lloyd_iter(1)}{_lloyd_iter(2)},
probes AS (
  SELECT vec_id AS qid, list_id FROM (
    SELECT q.vec_id, c.list_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_dot_product(q.qv, c.cv) AS BIGINT) DESC,
                      c.list_id) AS rn
    FROM q CROSS JOIN cents2 c WHERE q.vec_id < 32) WHERE rn <= 4
),
cand AS (
  SELECT p.qid, a.vec_id AS nid,
         CAST(list_dot_product(qq.qv, nq.qv) AS BIGINT) AS dot
  FROM probes p
  JOIN assign2 a ON a.list_id = p.list_id
  JOIN q nq ON nq.vec_id = a.vec_id
  JOIN q qq ON qq.vec_id = p.qid
  WHERE a.vec_id != p.qid
)
SELECT qid AS vec_id, CAST(rn AS BIGINT) AS rank, nid AS neighbor_id, dot
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
  FROM cand
)
WHERE rn <= 3"""

EMBED_BUCKETS_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv FROM embeddings
)
SELECT vec_id,
       CAST({' + '.join(f'(CASE WHEN {_hyperplane_sql(j)} > 0 THEN {1 << j} ELSE 0 END)' for j in range(N_HYPERPLANES))} AS BIGINT) AS bucket
FROM q"""

LANG_ID_SQL = f"""WITH grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(text) - 1),
                               i -> substr(text, i, 2))) AS bigram
  FROM documents
),
prof_counts AS (SELECT lang, bigram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
prof AS (
  SELECT lang, bigram FROM (
    SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rnk
    FROM prof_counts
  ) WHERE rnk <= {PROFILE_SIZE}
),
scores AS (
  SELECT g.doc_id, p.lang, COUNT(*) AS overlap
  FROM grams g JOIN prof p ON g.bigram = p.bigram
  GROUP BY g.doc_id, p.lang
),
pred AS (
  SELECT doc_id, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rnk
    FROM scores
  ) WHERE rnk = 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, p.lang AS pred_lang,
       d.lang AS actual_lang, p.lang = d.lang AS is_correct
FROM pred p JOIN documents d ON p.doc_id = d.doc_id"""

QUALITY_SQL = f"""WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN {sql_in(STOPWORDS)})) AS BIGINT) AS stopword_cnt,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_types, stopword_cnt, n_chars,
       round(n_types / n_tokens, 4) AS type_token_ratio,
       round(stopword_cnt / n_tokens, 4) AS stopword_ratio,
       round((n_chars - n_tokens + 1) / n_tokens, 4) AS mean_token_len,
       round(n_types / n_tokens / 2
             + (1 - stopword_cnt / n_tokens) / 4
             + least(n_tokens / 64.0, 1.0) / 4, 4) AS quality
FROM base"""

TOKEN_COUNTS_SQL = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST((length(t) + 3) // 4 AS BIGINT))),
         (acc, x) -> acc + x) AS n_subwords
FROM documents"""

_WIN_HASH = (
    "list_reduce(list_transform(string_split(substr(text, i, "
    f"{WINNOW_WINDOW}), ''), c -> CAST(ascii(c) AS BIGINT)), "
    f"(acc, x) -> (acc * 31 + x) % {MOD})"
)

FINGERPRINT_SQL = f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {_H_TEXT} AS fingerprint,
       list_min(list_transform(
         generate_series(1, greatest(length(text) - {WINNOW_WINDOW - 1}, 1)),
         i -> {_WIN_HASH})) AS winnow_min
FROM documents"""

BINARY_METADATA_SQL = f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {_H_TEXT} AS checksum
FROM documents"""

# multimodal decode check (multimodal.decode_check): the stand-in decode is
# byte arithmetic — f_i = float32(byte_i / 255), width/height from byte
# length — so DuckDB re-derives the exact integers from hex digits of the
# utf-8 payload. float32(b/255) is identical in both engines (one correctly
# rounded double divide + one f32 cast), so round(1e6·f) matches bit-exact.
_HEXDIG = "0123456789ABCDEF"


def _byte_q(i: int) -> str:
    """Quantized feature for 0-indexed byte i, 0 when the payload is shorter."""
    hi = f"(strpos('{_HEXDIG}', substr(hx, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('{_HEXDIG}', substr(hx, {2 * i + 2}, 1)) - 1)"
    # the f32 feature must promote to DOUBLE before the 1e6 multiply:
    # DuckDB keeps FLOAT*INT in float32, whose ~0.06 ulp at 1e6 flips
    # round() on half-boundary bytes (0xF0 did), while Spark promotes
    # float→double — caught by the unicode cross-engine pytest
    return (
        f"CASE WHEN n_bytes >= {i + 1} THEN "
        f"CAST(round(1000000 * CAST(CAST((16 * {hi} + {lo}) / 255.0 AS FLOAT) AS DOUBLE)) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END AS f{i}_q"
    )


MULTIMODAL_CHECK_SQL = f"""WITH payloads AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         upper(hex(encode(text))) AS hx
  FROM documents
)
SELECT doc_id,
       n_bytes % 64 + 1 AS width,
       n_bytes % 48 + 1 AS height,
       {', '.join(_byte_q(i) for i in range(8))}
FROM payloads"""

# frame-sample fan-out (multimodal.frame_sample): one row per 32-byte
# 'frame' window; mean_byte is one IEEE division of exact integers (byte
# sum from hex digits / frame length), portable without quantization.
_FRAME_BYTES = 32
_BYTE_AT = (
    f"(16 * (strpos('{_HEXDIG}', substr(hx, 2 * CAST(i AS INT) + 1, 1)) - 1)"
    f" + (strpos('{_HEXDIG}', substr(hx, 2 * CAST(i AS INT) + 2, 1)) - 1))"
)

FRAME_SAMPLE_SQL = f"""WITH payloads AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         upper(hex(encode(text))) AS hx
  FROM documents
),
frames AS (
  SELECT doc_id, n, hx, CAST(t.f AS BIGINT) AS frame_ix,
         CAST(t.f * {_FRAME_BYTES} AS BIGINT) AS off,
         CAST(least({_FRAME_BYTES}, n - t.f * {_FRAME_BYTES}) AS BIGINT) AS n_bytes
  FROM payloads,
  LATERAL unnest(generate_series(0,
      CAST(ceil(n / {_FRAME_BYTES}.0) - 1 AS BIGINT))) AS t(f)
)
SELECT doc_id, frame_ix, n_bytes,
       CAST(list_reduce(
              list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(off, off + n_bytes - 1),
                               i -> CAST({_BYTE_AT} AS BIGINT))),
              (acc, x) -> acc + x) AS DOUBLE) / n_bytes AS mean_byte
FROM frames"""

EXACT_DEDUP_SQL = f"""WITH hashed AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_H_TEXT} AS text_hash FROM documents
)
SELECT doc_id, text_hash,
       MIN(doc_id) OVER (PARTITION BY text_hash) AS canonical_doc_id,
       COUNT(*) OVER (PARTITION BY text_hash) AS group_size
FROM hashed"""

MINHASH_SIG_SQL = f"WITH {SHINGLES_CTE.strip()}\nSELECT doc_id, perm_ix, minhash FROM minsig"

LSH_PAIRS_SQL = f"WITH {SHINGLES_CTE.strip()}\nSELECT doc_a, doc_b FROM cand"

LSH_BUCKET_STATS_SQL = f"""WITH {SHINGLES_CTE.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COALESCE(SUM(CASE WHEN bucket_size > 64 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_buckets,
       CAST(COALESCE(SUM(CASE WHEN bucket_size > 64 THEN bucket_size ELSE 0 END), 0) AS BIGINT) AS n_dropped_rows,
       CAST(MAX(bucket_size) AS BIGINT) AS max_bucket_size
FROM (
  SELECT band_ix, band_hash, COUNT(*) AS bucket_size
  FROM bands GROUP BY band_ix, band_hash
)"""

NEAR_DUP_SQL = (
    f"WITH {SHINGLES_CTE.strip()}\n"
    "SELECT doc_a, doc_b, n_inter, n_union FROM jacc WHERE n_inter * 4 >= n_union * 1"
)

# embedding-cosine near-dup: all-integer verification (den²·dot² ≥ num²·n2a·n2b)
# over sign-LSH bucket candidates, cap-guarded like the text LSH
EMBED_NEAR_DUP_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv,
         CAST(list_dot_product({_QUANT}, {_QUANT}) AS BIGINT) AS n2
  FROM embeddings
),
qb AS (
  SELECT vec_id, qv, n2,
         CAST({' + '.join(f'(CASE WHEN {_hyperplane_sql(j)} > 0 THEN {1 << j} ELSE 0 END)' for j in range(N_HYPERPLANES))} AS BIGINT) AS bucket
  FROM q
),
capped AS (
  SELECT * FROM qb
  QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 256
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
         a.n2 AS norm2_a, b.n2 AS norm2_b
  FROM capped a JOIN capped b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, dot, norm2_a, norm2_b
FROM cand
WHERE dot > 0 AND 100 * dot * dot >= 9 * norm2_a * norm2_b"""

EMBED_BUCKET_STATS_SQL = f"""WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_QUANT} AS qv FROM embeddings
),
qb AS (
  SELECT CAST({' + '.join(f'(CASE WHEN {_hyperplane_sql(j)} > 0 THEN {1 << j} ELSE 0 END)' for j in range(N_HYPERPLANES))} AS BIGINT) AS bucket
  FROM q
),
pb AS (SELECT bucket, COUNT(*) AS bucket_size FROM qb GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COALESCE(SUM(CASE WHEN bucket_size > 256 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_buckets,
       CAST(COALESCE(SUM(CASE WHEN bucket_size > 256 THEN bucket_size ELSE 0 END), 0) AS BIGINT) AS n_dropped_rows,
       CAST(MAX(bucket_size) AS BIGINT) AS max_bucket_size
FROM pb"""

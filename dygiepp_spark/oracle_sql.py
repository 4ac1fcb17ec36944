"""DuckDB oracle SQL building blocks.

The driver's correctness gate runs each Spark query AND an equivalent ANSI
SQL query (DuckDB) over the same parquet tables and compares row counts,
schemas and value hashes. This module is the single source of truth for the
oracle side; the CTEs mirror — construct for construct — the Spark builders
in ``dygiepp_spark.tables`` / ``dygiepp_spark.operators``.

Determinism/portability rules (see functions.scoring / functions.hashing):
integer arithmetic everywhere possible, dyadic-rational scores, explicit
BIGINT casts so Spark long == DuckDB int64.
"""

from __future__ import annotations

from dygiepp_spark.config import PipelineConfig
from dygiepp_spark.functions.lexicons import (
    ENTITY_TYPES,
    MODIFIERS,
    PREDICATES,
    STOPWORDS,
    sql_in,
)
from dygiepp_spark.operators.canonicalize import ALIASES
from dygiepp_spark.tables import TOKENS_CTE, TURNS_CTE

_CFG = PipelineConfig()

_ENTITY_VALUES = ", ".join(f"('{t}', '{l}')" for t, l in sorted(ENTITY_TYPES.items()))
_ALIAS_VALUES = ", ".join(f"('{s}', '{c}')" for s, c in sorted(ALIASES.items()))


def raw_score(surface: str, width: str) -> str:
    return f"(((length({surface}) * 7 + ({width}) * 3) % 16) / 16.0 + ({width}))"


def softmax_score(surface: str, width: str) -> str:
    return f"(((length({surface}) * 7 + ({width}) * 3) % 16) / 32.0 + 0.5)"


# Every oracle query shares this prelude; DuckDB only materializes the CTEs
# a query actually references.
PRELUDE = f"""WITH {TURNS_CTE.strip()},
{TOKENS_CTE.strip()},
starts AS (
  SELECT conv_id, turn_idx, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
            PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sentence_start
  FROM turn_stats
),
entity_lex AS (SELECT * FROM (VALUES {_ENTITY_VALUES}) AS t(token, label)),
alias_lex AS (SELECT * FROM (VALUES {_ALIAS_VALUES}) AS t(surface_form, canonical_id)),
singles AS (
  SELECT t.conv_id, t.turn_idx, t.pos AS start, t.pos AS "end",
         l.label, t.token AS surface
  FROM tokens t JOIN entity_lex l ON t.token = l.token
),
nexts AS (
  SELECT conv_id, turn_idx, pos, token,
         lead(token) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS next_token
  FROM tokens
),
mod_pairs AS (
  SELECT n.conv_id, n.turn_idx, n.pos AS start, n.pos + 1 AS "end",
         l.label, n.token || ' ' || n.next_token AS surface
  FROM nexts n JOIN entity_lex l ON n.next_token = l.token
  WHERE n.token IN {sql_in(MODIFIERS)}
),
mentions AS (
  SELECT conv_id, turn_idx, start, "end", label, surface,
         {raw_score('surface', '"end" - start + 1')} AS raw_score,
         {softmax_score('surface', '"end" - start + 1')} AS softmax_score
  FROM (SELECT * FROM singles UNION ALL SELECT * FROM mod_pairs)
),
preds AS (
  SELECT conv_id, turn_idx, pos, token FROM tokens
  WHERE token IN {sql_in(PREDICATES)}
),
rel_pairs AS (
  SELECT s.conv_id, s.turn_idx,
         s.start AS subj_start, s.surface AS subj_surface,
         o.start AS obj_start, o.surface AS obj_surface
  FROM singles s
  JOIN singles o ON s.conv_id = o.conv_id AND s.turn_idx = o.turn_idx
  WHERE o.start > s.start AND o.start - s.start <= {_CFG.max_pair_distance}
),
rel_scored AS (
  SELECT p.*, pr.pos AS pred_pos, pr.token AS pred_tok,
         row_number() OVER (
           PARTITION BY p.conv_id, p.turn_idx, p.subj_start, p.obj_start
           ORDER BY pr.pos) AS rn
  FROM rel_pairs p
  JOIN preds pr ON p.conv_id = pr.conv_id AND p.turn_idx = pr.turn_idx
  WHERE pr.pos > p.subj_start AND pr.pos < p.obj_start
),
triples AS (
  SELECT conv_id, turn_idx,
         CAST(subj_start AS BIGINT) AS subj_start,
         CAST(subj_start AS BIGINT) AS subj_end,
         subj_surface,
         upper(pred_tok) AS pred,
         CAST(obj_start AS BIGINT) AS obj_start,
         CAST(obj_start AS BIGINT) AS obj_end,
         obj_surface,
         {raw_score("subj_surface || ' ' || obj_surface", 'obj_start - subj_start + 1')} AS raw_score,
         {softmax_score("subj_surface || ' ' || obj_surface", 'obj_start - subj_start + 1')} AS softmax_score
  FROM rel_scored WHERE rn = 1
),
spans AS (
  SELECT t.conv_id, t.turn_idx, st.n_tokens,
         t.pos AS start, t.pos + w.w AS "end", w.w + 1 AS width
  FROM tokens t
  JOIN turn_stats st ON t.conv_id = st.conv_id AND t.turn_idx = st.turn_idx
  CROSS JOIN (SELECT unnest(generate_series(0, {_CFG.max_span_width - 1})) AS w) w
  WHERE t.pos + w.w <= st.n_tokens - 1
),
span_surf AS (
  SELECT s.conv_id, s.turn_idx, s.n_tokens, s.start, s."end", s.width,
         array_to_string(list_slice(string_split(tu.text, ' '),
                                    s.start + 1, s."end" + 1), ' ') AS surface
  FROM spans s JOIN turns tu ON s.conv_id = tu.conv_id AND s.turn_idx = tu.turn_idx
),
cmentions AS (
  SELECT s.conv_id, s.turn_idx, s.start, s."end", s.surface,
         st.sentence_start + s.start AS doc_pos
  FROM singles s
  JOIN starts st ON s.conv_id = st.conv_id AND s.turn_idx = st.turn_idx
),
csurface AS (
  SELECT conv_id, surface, COUNT(*) AS n, MIN(doc_pos) AS cluster_id
  FROM cmentions GROUP BY conv_id, surface
),
clusters AS (
  SELECT m.conv_id, CAST(c.cluster_id AS BIGINT) AS cluster_id,
         m.turn_idx, m.start, m."end", m.surface, m.doc_pos
  FROM cmentions m
  JOIN csurface c ON m.conv_id = c.conv_id AND m.surface = c.surface
  WHERE c.n >= 2
),
stopword_lex AS (SELECT * FROM (VALUES {', '.join(f"('{s}')" for s in STOPWORDS)}) AS t(token))
"""


def q(select: str, recursive: bool = False) -> str:
    """Compose the shared prelude with a final SELECT; a query-local
    ``WITH x AS (...)`` block is spliced into the prelude's CTE list.
    ``recursive=True`` emits ``WITH RECURSIVE`` so a spliced CTE may
    self-reference (DuckDB, like Postgres, accepts non-recursive CTEs
    under the RECURSIVE keyword — used by the kg_components oracle)."""
    prelude = (
        PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1) if recursive else PRELUDE
    )
    s = select.lstrip()
    if s.upper().startswith("WITH "):
        return prelude + ",\n" + s[5:]
    return prelude + "\n" + s

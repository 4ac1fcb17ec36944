"""Brat standoff → reference-format documents (SURVEY.md §2 A7).

The reference converts brat .txt/.ann pairs with a per-file Python script
(scripts/new-dataset/brat_to_input.py:26-63; char→token alignment
annotated_doc.py:201-273). Distributed re-expression:

- .txt / .ann files load with `spark.read.text` + `input_file_name()` —
  one corpus-wide DataFrame each, no per-file driver loop;
- .ann line parsing (T/R/E/* annotations, brat standoff spec) is pure
  column regex/split expressions, JVM-side;
- tokenization with character offsets is the one Python step (the
  reference uses spaCy; this sandbox has no tokenizer libs, so the
  stand-in is whitespace tokens / newline sentences via re.finditer),
  Arrow-batched in mapInPandas — swap `_tokenize_batch` for a spaCy call
  in production, the plumbing is identical;
- char→token alignment is an equi-join on exact token boundaries, exactly
  the reference's criterion (annotated_doc.py:219-227: a brat span whose
  char_start is not a token start is DROPPED with a warning; brat char
  ends are exclusive, dygiepp token ends inclusive, annotated_doc.py:208);
- entities/relations crossing sentence boundaries drop with a counted
  report (the reference instead merges mis-split sentences,
  annotated_doc.py:274+; we surface the count and leave re-splitting to
  the caller);
- events take the trigger's FIRST token (annotated_doc.py:733-743).

`brat_gold(...)` returns the same turn-relative row shapes as the
`jsonl.gold_*_from_docs` parsers, so `jsonl.annotations_to_doc_json`
emits reference-format JSONL directly.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

TOKEN_SCHEMA = (
    "doc_key string, sent_ix int, tok_ix int, doc_tok_ix int, "
    "token string, char_start long, char_end long"
)


def _doc_key(path_col):
    return F.regexp_extract(F.element_at(F.split(path_col, "/"), -1), r"(.*)\.\w+$", 1)


def read_brat_texts(spark: SparkSession, path: str) -> DataFrame:
    """(doc_key, text) — whole .txt file per doc (brat is one doc per file).
    `wholetext` keeps newlines, which delimit sentences."""
    return (
        spark.read.text(f"{path}/*.txt", wholetext=True)
        .select(
            _doc_key(F.input_file_name()).alias("doc_key"),
            F.col("value").alias("text"),
        )
    )


def read_brat_ann_lines(spark: SparkSession, path: str) -> DataFrame:
    """(doc_key, line) — one row per .ann annotation line."""
    return (
        spark.read.text(f"{path}/*.ann")
        .where(F.length(F.trim("value")) > 0)
        .select(
            _doc_key(F.input_file_name()).alias("doc_key"),
            F.col("value").alias("line"),
        )
    )


def tokenize_with_offsets(texts: DataFrame) -> DataFrame:
    """Whitespace tokens with exact character offsets; sentences = lines.
    Arrow-batched; this is the spaCy slot (see module docstring)."""

    def _tokenize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_key, text in zip(pdf["doc_key"], pdf["text"]):
                doc_tok = 0
                offset = 0
                for sent_ix, line in enumerate(text.split("\n")):
                    for tok_ix, m in enumerate(re.finditer(r"\S+", line)):
                        rows.append(
                            (
                                doc_key,
                                sent_ix,
                                tok_ix,
                                doc_tok,
                                m.group(0),
                                offset + m.start(),
                                offset + m.end(),
                            )
                        )
                        doc_tok += 1
                    offset += len(line) + 1  # the newline
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_key", "sent_ix", "tok_ix", "doc_tok_ix",
                    "token", "char_start", "char_end",
                ],
            )

    return texts.mapInPandas(_tokenize_batch, TOKEN_SCHEMA)


def parse_ann(ann: DataFrame) -> dict[str, DataFrame]:
    """Split .ann lines into typed annotation tables (column exprs only).

    Returns dict with:
    - ents:   (doc_key, tid, label, char_start, char_end, surface,
               is_disjoint) — disjoint (';'-separated) spans are kept
               flagged so the dropped report can count them
               (brat_to_input.py docstring: disjoint entities dropped);
    - rels:   (doc_key, rid, label, arg1, arg2);
    - equivs: (doc_key, equiv_ix, members array<string>) — '*\tEquiv T1 T2…';
    - events: (doc_key, eid, trigger_type, trigger_tid,
               args array<struct<role,tid>>).
    """
    first = F.split("line", "\t")
    tagged = ann.select(
        "doc_key",
        first.getItem(0).alias("aid"),
        first.getItem(1).alias("body"),
        F.when(F.size(first) > 2, first.getItem(2)).alias("payload"),
    )
    ents = (
        tagged.where(F.col("aid").startswith("T"))
        .select(
            "doc_key",
            F.col("aid").alias("tid"),
            F.regexp_extract("body", r"^(\S+) ", 1).alias("label"),
            F.col("body").contains(";").alias("is_disjoint"),
            F.regexp_extract("body", r"^\S+ (\d+)", 1).cast("long").alias("char_start"),
            F.regexp_extract("body", r"(\d+)$", 1).cast("long").alias("char_end"),
            F.col("payload").alias("surface"),
        )
    )
    rels = tagged.where(F.col("aid").startswith("R")).select(
        "doc_key",
        F.col("aid").alias("rid"),
        F.regexp_extract("body", r"^(\S+)", 1).alias("label"),
        F.regexp_extract("body", r"Arg1:(\S+)", 1).alias("arg1"),
        F.regexp_extract("body", r"Arg2:(\S+)", 1).alias("arg2"),
    )
    equivs = (
        tagged.where(F.col("aid").startswith("*"))
        .withColumn("_parts", F.split(F.col("body"), " "))
        .select(
            "doc_key",
            # deterministic cluster id: hash of the member list (Equiv lines
            # carry no id of their own — aid is '*')
            F.xxhash64(
                "doc_key", F.array_join(F.array_sort(F.slice("_parts", 2, F.size("_parts") - 1)), " ")
            ).alias("equiv_ix"),
            F.slice("_parts", 2, F.size("_parts") - 1).alias("members"),
        )
    )
    events = (
        tagged.where(F.col("aid").startswith("E"))
        .withColumn("_parts", F.split(F.col("body"), " "))
        .select(
            "doc_key",
            F.col("aid").alias("eid"),
            F.split(F.element_at("_parts", 1), ":").getItem(0).alias("trigger_type"),
            F.split(F.element_at("_parts", 1), ":").getItem(1).alias("trigger_tid"),
            F.transform(
                F.slice("_parts", 2, F.greatest(F.size("_parts") - 1, F.lit(0))),
                lambda p: F.struct(
                    F.split(p, ":").getItem(0).alias("role"),
                    F.split(p, ":").getItem(1).alias("tid"),
                ),
            ).alias("args"),
        )
    )
    return {"ents": ents, "rels": rels, "equivs": equivs, "events": events}


def align_entities(tokens: DataFrame, ents: DataFrame) -> DataFrame:
    """char spans → token spans by exact-boundary equi-joins
    (annotated_doc.py:219-243). Returns every entity with nullable
    alignment columns; unaligned / disjoint / cross-sentence rows keep a
    `drop_reason` so callers can both filter and report."""
    starts = tokens.select(
        F.col("doc_key").alias("s_doc"),
        F.col("char_start").alias("s_char"),
        F.col("sent_ix").alias("start_sent"),
        F.col("tok_ix").alias("start_tok"),
    )
    ends = tokens.select(
        F.col("doc_key").alias("e_doc"),
        F.col("char_end").alias("e_char"),
        F.col("sent_ix").alias("end_sent"),
        F.col("tok_ix").alias("end_tok"),
    )
    aligned = (
        ents.join(
            starts,
            on=[
                F.col("doc_key") == F.col("s_doc"),
                F.col("char_start") == F.col("s_char"),
            ],
            how="left",
        )
        .drop("s_doc", "s_char")
        .join(
            ends,
            on=[
                F.col("doc_key") == F.col("e_doc"),
                F.col("char_end") == F.col("e_char"),
            ],
            how="left",
        )
        .drop("e_doc", "e_char")
    )
    return aligned.withColumn(
        "drop_reason",
        F.when(F.col("is_disjoint"), F.lit("disjoint"))
        .when(
            F.col("start_tok").isNull() | F.col("end_tok").isNull(),
            F.lit("tokenization_mismatch"),
        )
        .when(F.col("start_sent") != F.col("end_sent"), F.lit("cross_sentence")),
    )


def brat_gold(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """End-to-end brat corpus → engine tables:

    - turns: (conv_id, turn_idx, text) — sentences re-tokenized to
      single-space text (per-turn text equality holds against the token
      stream, the engine's input contract);
    - ner:   (conv_id, turn_idx, start, end, label) turn-relative;
    - relations: (conv_id, turn_idx, subj_start, subj_end, obj_start,
      obj_end, label) — within-sentence only;
    - clusters: (conv_id, cluster_id, turn_idx, start, end) from Equiv;
    - events: (conv_id, turn_idx, trigger_ix, event_type, arg_start,
      arg_end, role) — trigger = first token of the trigger entity;
    - dropped: (doc_key, kind, drop_reason, n) report.

    Feed the gold tables to jsonl.annotations_to_doc_json(turns, ...) to
    write reference-format JSONL."""
    texts = read_brat_texts(spark, path)
    tokens = tokenize_with_offsets(texts)
    ann = parse_ann(read_brat_ann_lines(spark, path))

    turns = tokens.groupBy(
        F.col("doc_key").alias("conv_id"), F.col("sent_ix").alias("turn_idx")
    ).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("tok_ix", "token"))),
                lambda x: x["token"],
            ),
            " ",
        ).alias("text")
    )

    aligned = align_entities(tokens, ann["ents"])
    ok = aligned.where(F.col("drop_reason").isNull()).select(
        "doc_key", "tid", "label", "surface",
        F.col("start_sent").alias("sent_ix"),
        F.col("start_tok").alias("start"),
        F.col("end_tok").alias("end"),
    )
    ner = ok.select(
        F.col("doc_key").alias("conv_id"),
        F.col("sent_ix").cast("int").alias("turn_idx"),
        F.col("start").cast("int"),
        F.col("end").cast("int"),
        "label",
    )

    a1 = ok.select(
        "doc_key", F.col("tid").alias("arg1"), F.col("sent_ix").alias("s1"),
        F.col("start").alias("subj_start"), F.col("end").alias("subj_end"),
    )
    a2 = ok.select(
        "doc_key", F.col("tid").alias("arg2"), F.col("sent_ix").alias("s2"),
        F.col("start").alias("obj_start"), F.col("end").alias("obj_end"),
    )
    rel_joined = ann["rels"].join(a1, on=["doc_key", "arg1"], how="left").join(
        a2, on=["doc_key", "arg2"], how="left"
    )
    relations = rel_joined.where(
        F.col("s1").isNotNull() & (F.col("s1") == F.col("s2"))
    ).select(
        F.col("doc_key").alias("conv_id"),
        F.col("s1").cast("int").alias("turn_idx"),
        F.col("subj_start").cast("int"),
        F.col("subj_end").cast("int"),
        F.col("obj_start").cast("int"),
        F.col("obj_end").cast("int"),
        "label",
    )

    members = ann["equivs"].select(
        "doc_key", "equiv_ix", F.explode("members").alias("tid")
    )
    clusters = members.join(
        ok.select("doc_key", "tid", "sent_ix", "start", "end"),
        on=["doc_key", "tid"],
    ).select(
        F.col("doc_key").alias("conv_id"),
        F.col("equiv_ix").cast("bigint").alias("cluster_id"),
        F.col("sent_ix").cast("int").alias("turn_idx"),
        F.col("start").cast("int"),
        F.col("end").cast("int"),
    )

    trig = ok.select(
        "doc_key", F.col("tid").alias("trigger_tid"),
        F.col("sent_ix").alias("t_sent"),
        F.col("start").alias("trigger_ix"),  # FIRST token of the trigger
    )
    ev_args = ann["events"].select(
        "doc_key", "eid", "trigger_type", "trigger_tid",
        F.explode_outer("args").alias("a"),
    )
    arg_tbl = ok.select(
        F.col("doc_key").alias("a_doc"),
        F.col("tid").alias("a_tid"),
        F.col("sent_ix").alias("a_sent"),
        F.col("start").alias("arg_start"),
        F.col("end").alias("arg_end"),
    )
    ev_al = ev_args.join(trig, on=["doc_key", "trigger_tid"], how="inner").join(
        arg_tbl,
        on=[F.col("doc_key") == F.col("a_doc"), F.col("a.tid") == F.col("a_tid")],
        how="left",
    )
    # reference drops the WHOLE event if any argument fails to align
    # (annotated_doc.py:712-722) — anti-join the bad event ids
    bad_events = ev_al.where(
        F.col("a.tid").isNotNull()
        & (F.col("a_tid").isNull() | (F.col("a_sent") != F.col("t_sent")))
    ).select("doc_key", "eid")
    events = ev_al.join(bad_events, on=["doc_key", "eid"], how="left_anti").select(
        F.col("doc_key").alias("conv_id"),
        F.col("t_sent").cast("int").alias("turn_idx"),
        F.col("trigger_ix").cast("int"),
        F.col("trigger_type").alias("event_type"),
        F.col("arg_start").cast("int"),
        F.col("arg_end").cast("int"),
        F.col("a.role").alias("role"),
    )

    ent_drops = aligned.where(F.col("drop_reason").isNotNull()).groupBy(
        "doc_key", F.lit("entity").alias("kind"), "drop_reason"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rel_drops = (
        rel_joined.withColumn(
            "drop_reason",
            F.when(F.col("s1").isNull() | F.col("s2").isNull(), "unaligned_arg")
            .when(F.col("s1") != F.col("s2"), "cross_sentence"),
        )
        .where(F.col("drop_reason").isNotNull())
        .groupBy("doc_key", F.lit("relation").alias("kind"), "drop_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    trig_drop_events = (
        ann["events"]
        .join(trig, on=["doc_key", "trigger_tid"], how="left_anti")
        .select("doc_key", "eid", F.lit("unaligned_trigger").alias("drop_reason"))
    )
    event_drops = (
        trig_drop_events.unionByName(
            bad_events.select("doc_key", "eid", F.lit("bad_argument").alias("drop_reason"))
        )
        .distinct()
        .groupBy("doc_key", F.lit("event").alias("kind"), "drop_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    dropped = ent_drops.unionByName(rel_drops).unionByName(event_drops)

    return {
        "turns": turns,
        "ner": ner,
        "relations": relations,
        "clusters": clusters,
        "events": events,
        "dropped": dropped,
    }

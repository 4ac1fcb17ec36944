"""Custom stateful streaming operator: incremental within-conversation
coreference edges via ``applyInPandasWithState``.

State per conv_id: the doc-level position of the last mention of each
surface form, plus the conversation's running token offset. Each
micro-batch appends that conversation's new turns, emits one antecedent
edge per new mention of an already-seen surface (the streaming twin of
operators.coref.antecedent_edges), and updates state. Downstream, clusters
form in batch via connected components over the accumulated edge table —
unbounded cluster state never lives in the stream.

Assumes per-conversation in-order arrival (turn_idx monotone across
micro-batches), which the file/Kafka source provides when producers write
turns in order. When a producer violates that, the behavior is defined and
pinned (tests/test_stateful_streaming.py late-arrival test): a late turn is
NEVER dropped and never fails the query — its tokens take doc positions at
the conversation's running offset, i.e. the output equals the batch
operator applied to the conversation in ARRIVAL order (same edge count as
true order; positions shifted). Within one micro-batch, turns are sorted by
turn_idx, so only cross-batch disorder mispositions. Deployments needing
true-order positions must bound disorder upstream: `reorder_turns` below is
that operator (stateful gap buffer releasing contiguous turn_idx runs).
Spark rejects two arbitrary-stateful operators in one query, so compose as
two queries: reorder → ordered sink/topic → incremental_coref_edges.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dygiepp_spark.functions.lexicons import ENTITY_TYPES

OUTPUT_SCHEMA = "conv_id string, doc_pos long, ant_doc_pos long, surface string"
STATE_SCHEMA = "last_pos string, total_tokens long"


def _edges_for_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # idle-conversation expiry: drop state, emit nothing, do NOT re-arm
        # the timeout — otherwise expired conversations re-update forever and
        # state grows without bound on a continuous stream
        state.remove()
        yield pd.DataFrame(
            {"conv_id": [], "doc_pos": [], "ant_doc_pos": [], "surface": []}
        )
        return
    if state.exists:
        last_pos_json, total_tokens = state.get
        last_pos: dict[str, int] = json.loads(last_pos_json)
    else:
        last_pos, total_tokens = {}, 0

    rows: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        for text in pdf["text"]:
            toks = text.split(" ")
            for i, tok in enumerate(toks):
                if tok in ENTITY_TYPES:
                    pos = total_tokens + i
                    prev = last_pos.get(tok)
                    if prev is not None:
                        rows.append((conv_id, pos, prev, tok))
                    last_pos[tok] = pos
            total_tokens += len(toks)

    state.update((json.dumps(last_pos), total_tokens))
    state.setTimeoutDuration(30 * 60 * 1000)  # idle conversations expire
    yield pd.DataFrame(rows, columns=["conv_id", "doc_pos", "ant_doc_pos", "surface"])


REORDER_OUTPUT_SCHEMA = "conv_id string, turn_idx int, text string"
REORDER_STATE_SCHEMA = "next_idx int, buffered string"


def _reorder_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # flush whatever is buffered IN ORDER (gaps never arrived) so a
        # truncated conversation still drains, then drop state
        _, buffered_json = state.get
        buffered: dict[str, str] = json.loads(buffered_json)
        rows = sorted(((int(k), v) for k, v in buffered.items()))
        state.remove()
        yield pd.DataFrame(
            {
                "conv_id": [conv_id] * len(rows),
                "turn_idx": [k for k, _ in rows],
                "text": [v for _, v in rows],
            }
        )
        return
    if state.exists:
        next_idx, buffered_json = state.get
        buffered = json.loads(buffered_json)
    else:
        next_idx, buffered = 0, {}
    for pdf in pdfs:
        for t_idx, text in zip(pdf["turn_idx"], pdf["text"]):
            buffered[str(int(t_idx))] = text
    out: list[tuple[int, str]] = []
    while str(next_idx) in buffered:
        out.append((next_idx, buffered.pop(str(next_idx))))
        next_idx += 1
    state.update((next_idx, json.dumps(buffered)))
    state.setTimeoutDuration(30 * 60 * 1000)  # stale-gap conversations drain
    yield pd.DataFrame(
        {
            "conv_id": [conv_id] * len(out),
            "turn_idx": [k for k, _ in out],
            "text": [v for _, v in out],
        }
    )


def reorder_turns(turns_stream: DataFrame) -> DataFrame:
    """Stateful in-order re-emitter: buffers out-of-order turns per
    conversation and releases them in contiguous turn_idx order (0,1,2,...)
    — the upstream fix for producers that violate the in-order-arrival
    assumption of incremental_coref_edges. State per conversation is the
    next expected index plus only the GAP turns (released turns leave
    state immediately), so state stays bounded by producer disorder, not
    conversation length. A conversation idle past the processing-time
    timeout drains its buffer in order and drops state (a permanently
    missing turn cannot hold the tail hostage forever)."""
    return (
        turns_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _reorder_group,
            outputStructType=REORDER_OUTPUT_SCHEMA,
            stateStructType=REORDER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def incremental_coref_edges(turns_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of antecedent edges, exactly matching the batch
    operator on in-order input (pinned by pytest)."""
    return (
        turns_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _edges_for_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

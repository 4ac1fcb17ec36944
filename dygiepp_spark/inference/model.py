"""Deterministic stand-in scoring model (executor-side).

Plays the role of the reference's DyGIE model forward pass
(reference: dygie/models/dygie.py:163-274): given a batch of tokenized
turns it enumerates candidate spans, scores them, prunes, scores pairs and
decodes typed predictions. No trained weights exist in-sandbox (SURVEY.md §7
hard-part 5), so scoring is the deterministic lexicon system — but the
*interface and batch shape* are exactly what a real encoder head would use:
one forward() per micro-batch of turns, numpy-vectorized, model object
loaded once per executor process via a module-level singleton (the Spark
analogue of the reference's load_archive-once pattern,
dygie/spacy_interface.py:129-134).

A real deployment swaps `StandInModel` for a transformer-backed scorer with
the same forward() contract; nothing else in the pipeline changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from dygiepp_spark.config import PipelineConfig
from dygiepp_spark.functions.lexicons import ENTITY_TYPES, MODIFIERS, PREDICATES
from dygiepp_spark.functions.scoring import raw_score_py, softmax_score_py


@dataclass
class TurnPredictions:
    """Decoded predictions for one turn (turn-relative inclusive offsets)."""

    mentions: list[tuple[int, int, str, str, float, float]] = field(default_factory=list)
    triples: list[tuple[int, str, int, str, str, float, float]] = field(default_factory=list)
    triggers: list[tuple[int, str, float, float]] = field(default_factory=list)
    arguments: list[tuple[int, str, int, str, str]] = field(default_factory=list)


class StandInModel:
    """Deterministic extraction model with the reference decode semantics."""

    def __init__(self, cfg: PipelineConfig | None = None) -> None:
        self.cfg = cfg or PipelineConfig()
        self._ent = dict(ENTITY_TYPES)
        self._mods = set(MODIFIERS)
        self._preds = set(PREDICATES)

    def forward(self, token_batch: list[list[str]]) -> list[TurnPredictions]:
        """One micro-batch of turns → per-turn decoded predictions."""
        return [self._forward_one(toks) for toks in token_batch]

    def _forward_one(self, toks: list[str]) -> TurnPredictions:
        out = TurnPredictions()
        n = len(toks)
        is_ent = np.fromiter((t in self._ent for t in toks), bool, n)
        is_pred = np.fromiter((t in self._preds for t in toks), bool, n)
        ent_pos = np.flatnonzero(is_ent)
        pred_pos = np.flatnonzero(is_pred)

        # NER decode (E1): width-1 entity spans + modifier+entity width-2
        for p in ent_pos:
            tok = toks[p]
            out.mentions.append(
                (int(p), int(p), self._ent[tok], tok,
                 raw_score_py(tok, 1), softmax_score_py(tok, 1))
            )
        for p in range(n - 1):
            if toks[p] in self._mods and toks[p + 1] in self._ent:
                surf = f"{toks[p]} {toks[p + 1]}"
                out.mentions.append(
                    (p, p + 1, self._ent[toks[p + 1]], surf,
                     raw_score_py(surf, 2), softmax_score_py(surf, 2))
                )

        # relation decode (E2): entity pairs within max distance with the
        # earliest predicate strictly between
        maxd = self.cfg.max_pair_distance
        for i in ent_pos:
            for j in ent_pos[(ent_pos > i) & (ent_pos - i <= maxd)]:
                between = pred_pos[(pred_pos > i) & (pred_pos < j)]
                if between.size:
                    k = int(between[0])
                    surf = f"{toks[i]} {toks[j]}"
                    width = int(j - i + 1)
                    out.triples.append(
                        (int(i), toks[i], int(j), toks[j], toks[k].upper(),
                         raw_score_py(surf, width), softmax_score_py(surf, width))
                    )

        # trigger decode (E5) + argument decode with trigger gate (E6)
        maxa = self.cfg.max_arg_distance
        for p in pred_pos:
            tok = toks[p]
            out.triggers.append(
                (int(p), tok.upper(), raw_score_py(tok, 1), softmax_score_py(tok, 1))
            )
            for a in ent_pos[np.abs(ent_pos - p) <= maxa]:
                if a != p:
                    role = "ARG_BEFORE" if a < p else "ARG_AFTER"
                    out.arguments.append((int(p), tok.upper(), int(a), toks[a], role))
        return out


_MODEL: StandInModel | None = None


def get_model(cfg: PipelineConfig | None = None) -> StandInModel:
    """Per-executor singleton (one model load per Python worker, the A5
    pattern: ship weights with --py-files/--archives, load lazily)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = StandInModel(cfg)
    return _MODEL

"""LM-based per-character likelihood detector.

The north-star detector: each span's characters are scored with
per-character likelihoods over a sliding context window; the characters
the model finds least likely in context are flagged as suspicious.  Used
for spans WITHOUT recogniser confidences when
``CorrectorConfig.nonprob_detector = "lm"`` (the default "all" keeps the
reference's every-position-suspect semantics,
base_corrector.py:75-86).

The scoring network is the deterministic random-projection net from
model/scorer.py (seeded weights, per-sentence forward: outputs never
depend on batch composition); a real bidirectional LM plugs in the same
way.  Flagging is quantile-based — the bottom ``quantile`` of positions
by likelihood, capped at ``max_flags`` (3, so the corrector's masked
branch applies) — which keeps the decision scale-free under an untrained
scorer and bounded under any scorer.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..functions.tokenization import FullTokenizer, build_synthetic_vocab
from .scorer import RandomProjectionLogits


class LikelihoodDetector:
    def __init__(self, tokenizer: FullTokenizer | None = None, logits_fn=None):
        if tokenizer is None:
            from .. import datagen

            _, inv, _ = datagen.static_tables()
            tokenizer = FullTokenizer(build_synthetic_vocab(inv))
        self.tokenizer = tokenizer
        self.logits_fn = logits_fn or RandomProjectionLogits(len(tokenizer.vocab))
        self.unk_id = tokenizer.vocab["[UNK]"]

    def char_likelihoods(self, text: str) -> np.ndarray:
        """Per-character probability of the observed char given its
        sliding context window (softmax over the vocab)."""
        ids = np.asarray(
            [self.tokenizer.vocab.get(c, self.unk_id) for c in text], dtype=np.int64
        )
        logits = self.logits_fn(ids, np.arange(len(ids)))
        z = logits - logits.max(axis=1, keepdims=True)
        probs = np.exp(z)
        probs /= probs.sum(axis=1, keepdims=True)
        return probs[np.arange(len(ids)), ids]

    def suspicious_positions(
        self, text: str, quantile: float = 0.2, max_flags: int = 3,
        rel_threshold: float = 0.9,
    ) -> List[int]:
        """Positions whose likelihood is BOTH below ``rel_threshold`` x the
        span's median likelihood and in the bottom ``quantile`` — capped at
        ``max_flags`` (so the corrector's masked branch applies).  A span
        whose likelihood profile is flat yields NO flags (clean spans pass
        through, unlike an unconditional bottom-k)."""
        if not text:
            return []
        lik = self.char_likelihoods(text)
        median = float(np.median(lik))
        k = min(max_flags, max(1, int(round(len(text) * quantile))))
        # lowest-likelihood positions (ties broken by position for
        # determinism), filtered by the relative threshold
        order = np.lexsort((np.arange(len(lik)), lik))[:k]
        return sorted(int(i) for i in order if lik[i] < rel_threshold * median)

"""Masked-LM scorer harness: tokenize -> frame -> mask -> score -> top-n.

Re-implements the reference's batch plumbing around its BERT graph
(/root/reference/corrector/bert_modeling/masked_lm.py) with the model
itself as a pluggable ``logits_fn`` — the fine-tuned checkpoint is an
external download unavailable by design (README.md:69-74):

- framing      : masked_lm.py:251-283 ("[CLS] 。 tokens 。 [SEP]", error
                 positions shifted +2, ids/mask/segments padded to
                 ``max_seq_length``)
- mask creation: masked_lm.py:285-302 (<=3 errors -> '[MASK]', else keep
                 the original token; positions+labels recorded)
- batch padding: masked_lm.py:225-248 (mask slots padded to the BATCH max
                 error count — A1; output-neutral, asserted in tests)
- top-n        : masked_lm.py:76-77, 400-447 (per masked position, top-n
                 candidates sorted by descending probability; flat result
                 streams re-grouped per sentence)

``RandomProjectionLogits`` is a deterministic stand-in network (seeded
weights, per-position forward) so the whole harness is exercisable; a
real BERT backend plugs in as another ``logits_fn``.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

from ..functions.lm import MASK_ERROR_LIMIT, CandidateModel
from ..functions.tokenization import FullTokenizer

Candidate = Tuple[str, float]


def frame_sentence(
    tokens: List[str], errors: Sequence[int], max_seq_length: int
) -> Tuple[List[str], List[int]]:
    """Add the framing tokens and shift error positions (+2)."""
    framed = ["[CLS]", "。"] + list(tokens) + ["。", "[SEP]"]
    return framed, [e + 2 for e in errors]


def create_masks(
    tokens: List[str], errors: Sequence[int]
) -> Tuple[List[str], List[int], List[str]]:
    """<=3 errors => '[MASK]' substitution, else keep the original token
    (replacing many tokens destroys the context the LM needs)."""
    input_tokens = list(tokens)
    positions: List[int] = []
    labels: List[str] = []
    masked_token_global = "[MASK]" if len(errors) <= MASK_ERROR_LIMIT else None
    for index in errors:
        input_tokens[index] = masked_token_global or tokens[index]
        positions.append(index)
        labels.append(tokens[index])
    return input_tokens, positions, labels


class BatchData:
    """One padded model batch (ids / mask / segments / masked positions)."""

    def __init__(
        self,
        sentences: Sequence[str],
        error_positions: Sequence[Sequence[int]],
        tokenizer: FullTokenizer,
        max_seq_length: int,
        pre_tokens: Sequence[Sequence[str]] | None = None,
    ):
        self.batch_size = len(sentences)
        self.seq_length = max_seq_length
        self.error_num_of_sents = [len(list(e)) for e in error_positions]
        self.batch_error_num = max(self.error_num_of_sents) if self.error_num_of_sents else 0

        prepped = []
        for idx, (sent, errs) in enumerate(zip(sentences, error_positions)):
            tokens = (
                list(pre_tokens[idx]) if pre_tokens is not None else tokenizer.tokenize(sent)
            )
            framed, errs2 = frame_sentence(tokens, list(errs), max_seq_length)
            prepped.append(create_masks(framed, errs2))
        # the reference's graph takes a dynamic sequence dim and never
        # truncates (its length filter happens upstream); pad to the longer
        # of max_seq_length and the batch's longest framed sentence
        if prepped:
            max_seq_length = max(
                max_seq_length, max(len(p[0]) for p in prepped)
            )
            self.seq_length = max_seq_length

        ids_b, mask_b, seg_b, pos_b, lab_b, w_b = [], [], [], [], [], []
        for input_tokens, positions, labels in prepped:
            ids = tokenizer.convert_tokens_to_ids(input_tokens)
            mask = [1] * len(ids)
            seg = [0] * len(ids)
            while len(ids) < max_seq_length:
                ids.append(0)
                mask.append(0)
                seg.append(0)
            lab_ids = tokenizer.convert_tokens_to_ids(labels)
            weights = [1.0] * len(lab_ids)
            while len(positions) < self.batch_error_num:
                positions.append(0)
                lab_ids.append(0)
                weights.append(0.0)
            ids_b.append(ids)
            mask_b.append(mask)
            seg_b.append(seg)
            pos_b.append(positions)
            lab_b.append(lab_ids)
            w_b.append(weights)
        self.input_ids = np.asarray(ids_b, dtype=np.int32)
        self.input_mask = np.asarray(mask_b, dtype=np.int32)
        self.segment_ids = np.asarray(seg_b, dtype=np.int32)
        self.masked_lm_positions = np.asarray(pos_b, dtype=np.int32)
        self.masked_lm_ids = np.asarray(lab_b, dtype=np.int32)
        self.masked_lm_weights = np.asarray(w_b, dtype=np.float32)


class RandomProjectionLogits:
    """Deterministic per-position logits: embed the ids, mix through a
    seeded 2-layer tanh net, project to vocab.  The forward runs PER
    SENTENCE so results never depend on batch composition (the
    exactness-across-batching requirement, SURVEY.md §7.4)."""

    def __init__(self, vocab_size: int, dim: int = 64, seed: int = 20240817):
        rng = np.random.RandomState(seed)
        self.emb = rng.normal(scale=0.5, size=(vocab_size, dim)).astype(np.float64)
        self.w1 = rng.normal(scale=0.3, size=(dim, dim)).astype(np.float64)
        self.w2 = rng.normal(scale=0.3, size=(dim, vocab_size)).astype(np.float64)

    def __call__(self, input_ids: np.ndarray, positions: np.ndarray) -> np.ndarray:
        """(seq,), (k,) -> (k, vocab) logits for one sentence."""
        h = self.emb[input_ids]                    # (seq, dim)
        ctx = np.tanh(h + np.roll(h, 1, axis=0) + np.roll(h, -1, axis=0))
        ctx = np.tanh(ctx @ self.w1)
        return ctx[positions] @ self.w2            # (k, vocab)


class MaskedLMScorer(CandidateModel):
    """The ST1 stage: implements ``find_topn_candidates`` via the full
    tokenize/frame/mask/score path.  Load once per Ray actor."""

    def __init__(
        self,
        tokenizer: FullTokenizer,
        logits_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
        topn: int = 3,
        max_seq_length: int = 64,
        batch_size: int = 16,
    ):
        self.tokenizer = tokenizer
        self.logits_fn = logits_fn or RandomProjectionLogits(len(tokenizer.vocab))
        self.topn = topn
        self.max_seq_length = max_seq_length
        self.batch_size = batch_size

    def find_topn_candidates(
        self, sentences: Sequence[str], error_positions: Sequence[Sequence[int]]
    ) -> List[List[List[Candidate]]]:
        # The scorer's positional contract: error positions are CHAR
        # indices, valid only when tokenization is one-token-per-char
        # (true for the CJK spans the LM filter admits).  Whitespace /
        # control chars the tokenizer drops would silently shift every
        # position — such sentences are declared unscorable (empty
        # candidate lists => the acceptance loop's per-text containment
        # passes them through).  Tokenised ONCE here; tokens flow into
        # BatchData via pre_tokens.
        all_tokens = [self.tokenizer.tokenize(s) for s in sentences]
        out_map: dict = {}
        scorable = []
        for i, (sent, toks) in enumerate(zip(sentences, all_tokens)):
            errs = list(error_positions[i])
            if len(toks) == len(sent) and all(0 <= e < len(sent) for e in errs):
                scorable.append(i)
            else:
                out_map[i] = [[] for _ in errs]
        scored = self._score(
            [sentences[i] for i in scorable],
            [list(error_positions[i]) for i in scorable],
            [all_tokens[i] for i in scorable],
        )
        for i, res in zip(scorable, scored):
            out_map[i] = res
        return [out_map[i] for i in range(len(sentences))]

    def _score(
        self,
        sentences: Sequence[str],
        error_positions: Sequence[Sequence[int]],
        pre_tokens: Sequence[Sequence[str]],
    ) -> List[List[List[Candidate]]]:
        result: List[List[List[Candidate]]] = []
        inv = self.tokenizer.inv_vocab
        for start in range(0, len(sentences), self.batch_size):
            batch = BatchData(
                sentences[start : start + self.batch_size],
                [list(e) for e in error_positions[start : start + self.batch_size]],
                self.tokenizer,
                self.max_seq_length,
                pre_tokens=pre_tokens[start : start + self.batch_size],
            )
            for i in range(batch.batch_size):
                n_err = batch.error_num_of_sents[i]
                sent_out: List[List[Candidate]] = []
                if n_err:
                    positions = batch.masked_lm_positions[i, :n_err]
                    logits = self.logits_fn(batch.input_ids[i], positions)
                    # softmax + per-position top-n sorted descending (A2)
                    z = logits - logits.max(axis=1, keepdims=True)
                    probs = np.exp(z)
                    probs /= probs.sum(axis=1, keepdims=True)
                    for j in range(n_err):
                        top = np.argsort(-probs[j], kind="stable")[: self.topn]
                        sent_out.append(
                            [(inv[int(t)], float(probs[j][t])) for t in top]
                        )
                result.append(sent_out)
        return result

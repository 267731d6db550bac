"""Offline training-data tooling (the Ray-native face of the reference's
create_data.py pipeline, SURVEY.md §2.1 S9 / §2.5 A6):

- ``correction_pairs``: join original and corrected span streams into
  aligned (wrong, correct) sentence pairs — the reference's
  wrong.txt/correct.txt writer re-expressed as a Dataset.
- ``confusion_counts``: per-(wrong_char, correct_char) frequency counts —
  the reference's confusion statistics (create_data.py:85-90), done as a
  partial aggregation inside map_batches (one count row per pair per
  batch) followed by a small groupby, instead of a shuffle of every char.
- ``sentence_split``: the training sentence splitter (create_data.py:6-27)
  as a flat_map-style batch transform.
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def correction_pairs(original_ds, cfg=None, changed_only: bool = True):
    """Aligned (doc_id, offset, wrong, correct) span-text rows.

    ``wrong`` is the EXTRACTED original span text (HTML/PDF boilerplate
    already stripped — the same string the corrector saw), so pairs line
    up character-for-character with the corrections.  The correction
    pipeline runs inline (fused plan): original and corrected text live
    in one pass, no join.

    ``changed_only=True`` keeps only spans the corrector changed (the
    wrong.txt/correct.txt writer analogue); ``False`` keeps every text
    span — required by ``mask_probabilities``, whose denominator counts
    unchanged occurrences across the WHOLE corpus (create_data.py:134-143).
    """
    from ..functions.extract import extract_span
    from ..stages.correct_stage import DocCorrector, default_side_data
    from ..stages.explode import explode_docs

    import ray

    side = ray.put(default_side_data())

    class PairEmitter(DocCorrector):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            orig_spans = explode_docs(batch)
            # extraction on the originals so 'wrong' is what the
            # corrector actually consumed (char-aligned with 'correct')
            kinds = orig_spans.column("kind").to_pylist()
            texts = orig_spans.column("text").to_pylist()
            extracted = []
            for k, t in zip(kinds, texts):
                try:
                    extracted.append(extract_span(k, t) if t else t)
                except Exception:
                    extracted.append(t)
            orig_spans = orig_spans.set_column(
                orig_spans.column_names.index("text"), "text",
                pa.array(extracted, pa.string()),
            )
            corr = out.column("spans").combine_chunks()
            parent = pc.list_parent_indices(corr)
            flat = corr.flatten()
            corr_tbl = pa.table(
                {
                    "doc_id": pc.take(out.column("doc_id"), parent),
                    "kind": flat.field("kind"),
                    "offset": flat.field("offset"),
                    "correct": flat.field("text"),
                }
            )
            o = orig_spans.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
            c = corr_tbl.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
            wrong = o.column("text")
            correct = c.column("correct")
            keep = pc.invert(pc.equal(c.column("kind"), pa.scalar("image")))
            if changed_only:
                keep = pc.and_(keep, pc.invert(pc.equal(wrong, correct)))
            return pa.table(
                {
                    "doc_id": pc.filter(c.column("doc_id"), keep),
                    "offset": pc.filter(c.column("offset"), keep),
                    "wrong": pc.filter(wrong, keep),
                    "correct": pc.filter(correct, keep),
                }
            )

    return original_ds.map_batches(
        PairEmitter,
        fn_constructor_kwargs={"cfg": cfg, "side": side},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=1,
    )


def confusion_counts(pairs_ds):
    """(wrong_char, correct_char, n) from aligned pair rows.  Partial
    aggregation per batch (value_counts) then a tiny groupby-sum."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {}
        for wrong, correct in zip(df["wrong"], df["correct"]):
            if len(wrong) != len(correct):
                continue  # alignment guard (create_data.py:62-68)
            for wc, cc in zip(wrong, correct):
                if wc != cc:
                    rows[(wc, cc)] = rows.get((wc, cc), 0) + 1
        if not rows:
            return pd.DataFrame({"wrong_char": pd.Series([], dtype="object"),
                                 "correct_char": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        keys = list(rows)
        return pd.DataFrame(
            {
                "wrong_char": [k[0] for k in keys],
                "correct_char": [k[1] for k in keys],
                "n": pd.Series([rows[k] for k in keys], dtype="int64"),
            }
        )

    partials = pairs_ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["wrong_char", "correct_char"]).aggregate(Sum("n", alias_name="n"))


def mask_probabilities(pairs_ds):
    """Per-character masking probability for confusion-aware LM training —
    the reference's ``mask_probability.sav`` computation
    (create_data.py:123-147): keyed by the WRONG char ``w``,

        mask_prob(w) = min( max_c count(w -> c at w != c positions)
                            / count(w at w == c positions), 1.0 )

    Chars that never appear UNCHANGED anywhere get no entry (the reference
    asserts ``correct_count != 0`` and simply omits them).

    The reference scans its AUGMENTED corpus for the denominator: every
    changed sentence is written twice — (wrong, correct) AND (correct,
    correct) (create_data.py:98-101) — so for changed rows the unchanged
    count here includes the correct-duplicate's positions too.  (The
    reference additionally writes randomly interpolated fake docs from an
    UNSEEDED np.random — irreproducible even run-to-run there — which
    this deterministic engine intentionally omits.)

    Feed ``correction_pairs(..., changed_only=False)`` so unchanged spans
    contribute as well.  Single pass: one map_batches emits both the
    confusion partials and the unchanged partials; nothing large is
    materialised.  Returns a ray Dataset (char, mask_probability)."""
    import ray.data

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        conf: dict = {}
        occ: dict = {}
        for wrong, correct in zip(df["wrong"], df["correct"]):
            if len(wrong) != len(correct):
                continue  # alignment guard, mirrors confusion_counts
            changed = wrong != correct
            for wc, cc in zip(wrong, correct):
                if wc != cc:
                    conf[(wc, cc)] = conf.get((wc, cc), 0) + 1
                else:
                    occ[wc] = occ.get(wc, 0) + 1
            if changed:
                # the (correct, correct) duplicate the reference writes
                for cc in correct:
                    occ[cc] = occ.get(cc, 0) + 1
        rows_kind, rows_a, rows_b, rows_n = [], [], [], []
        for (wc, cc), n in conf.items():
            rows_kind.append("conf")
            rows_a.append(wc)
            rows_b.append(cc)
            rows_n.append(n)
        for ch, n in occ.items():
            rows_kind.append("occ")
            rows_a.append(ch)
            rows_b.append("")
            rows_n.append(n)
        return pd.DataFrame(
            {
                "kind": pd.Series(rows_kind, dtype="object"),
                "a": pd.Series(rows_a, dtype="object"),
                "b": pd.Series(rows_b, dtype="object"),
                "n": pd.Series(rows_n, dtype="int64"),
            }
        )

    from ._agg import grouped_agg

    merged_counts = grouped_agg(
        pairs_ds.map_batches(partials, batch_format="pandas"),
        ["kind", "a", "b"],
        {"n": ("n", "sum")},
    ).to_pandas()

    empty = pd.DataFrame(
        {"char": pd.Series([], dtype="object"),
         "mask_probability": pd.Series([], dtype="float64")}
    )
    conf = merged_counts[merged_counts["kind"] == "conf"]
    occ = merged_counts[merged_counts["kind"] == "occ"][["a", "n"]].rename(
        columns={"a": "char", "n": "n_occ"}
    )
    if conf.empty:
        return ray.data.from_pandas(empty)
    # top confusion per WRONG char (top_confusions[k[0]], create_data.py:124-129)
    top = conf.groupby("a", as_index=False)["n"].max().rename(columns={"a": "char"})
    # inner merge: chars never seen unchanged are omitted (reference parity)
    merged = top.merge(occ, on="char", how="inner")
    if merged.empty:
        return ray.data.from_pandas(empty)
    prob = (merged["n"] / merged["n_occ"]).clip(upper=1.0).round(6)
    return ray.data.from_pandas(
        pd.DataFrame({"char": merged["char"], "mask_probability": prob})
    )


def training_instances(
    pairs_ds,
    mask_probs: dict,
    dupe_factor: int = 2,
    seed: int = 12345,
    masked_lm_prob: float = 0.15,
    max_predictions: int = 20,
):
    """Masked-LM training instances with confusion-aware masking — the
    Ray-native restatement of the reference's TFRecord builder
    (create_tf_record.py:427-539; seed 12345 at :593, dupe_factor :64-66).
    TFRecord output itself is descoped for the serving path (SURVEY §2.1
    S10); instances are parquet-able rows:

        (doc_id, offset, source, dup, tokens, masked_positions, labels)

    Per aligned pair, per duplicate:
    - ``source='correct'`` (create_masked_lm_predictions:427-485):
      ~``masked_lm_prob`` of positions selected (shuffled candidates,
      capped at ``max_predictions``), BERT 80/10/10 substitution, then
      the confusion-aware OVERRIDE — a char in ``mask_probs`` is, with
      that probability, kept VISIBLE (the model must learn to judge a
      possibly-wrong char it can see).
    - ``source='wrong'`` (…_for_wrong_sentences:488-539): every confused
      position is a target (the wrong char stays visible, label = the
      correct char); unchanged positions join as targets with their
      ``mask_probs`` probability; 100% masking-rate cap.

    Deviations from the reference, on purpose: rng is seeded per
    (sentence, dup) instead of one shared sequential stream (the
    reference's instance content depends on corpus iteration order and
    is not reproducible across runs — here it is, and is independent of
    batch composition); sequences are raw char lists without [CLS]/[SEP]
    framing (framing belongs to model/scorer.py).
    """
    import hashlib
    import random as _random

    import ray

    probs_ref = ray.put(dict(mask_probs))

    class Generate:
        def __init__(self, ref):
            self.mask_probs = ray.get(ref)
            from .. import datagen as _dg

            _, inv, _ = _dg.static_tables()
            self.inventory = inv

        def _rng(self, *parts) -> _random.Random:
            h = hashlib.md5("\x1f".join(str(p) for p in parts).encode()).digest()
            return _random.Random(int.from_bytes(h[:8], "big"))

        def _emit_correct(self, correct: str, dup: int):
            rng = self._rng(seed, "correct", correct, dup)
            cand = list(range(len(correct)))
            rng.shuffle(cand)
            num_to_predict = min(
                max_predictions, max(1, int(round(len(correct) * masked_lm_prob)))
            )
            tokens = list(correct)
            selected = []
            for index in cand:
                if len(selected) >= num_to_predict:
                    break
                if rng.random() < 0.8:
                    masked = "[MASK]"
                elif rng.random() < 0.5:
                    masked = correct[index]
                else:
                    masked = self.inventory[rng.randrange(len(self.inventory))]
                # confusion-aware override: a confusable char stays VISIBLE
                # with its masking probability (create_tf_record.py:466-470)
                p = self.mask_probs.get(correct[index])
                if p is not None and rng.random() < p:
                    masked = correct[index]
                tokens[index] = masked
                selected.append(index)
            if not selected:
                return None
            selected.sort()
            return tokens, selected, [correct[i] for i in selected]

        def _emit_wrong(self, wrong: str, correct: str, dup: int):
            rng = self._rng(seed, "wrong", wrong, correct, dup)
            cand = []
            for i, (w, c) in enumerate(zip(wrong, correct)):
                if w != c:
                    cand.append(i)
                else:
                    p = self.mask_probs.get(c)
                    if p is not None and rng.random() < p:
                        cand.append(i)
            rng.shuffle(cand)
            num_to_predict = min(max_predictions, max(1, len(correct)))  # 100% rate
            tokens = list(correct)
            selected = []
            for index in cand:
                if len(selected) >= num_to_predict:
                    break
                tokens[index] = wrong[index]  # the wrong char stays visible
                selected.append(index)
            if not selected:
                return None
            selected.sort()
            return tokens, selected, [correct[i] for i in selected]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = {k: [] for k in ("doc_id", "offset", "source", "dup", "tokens",
                                    "masked_positions", "labels")}

            def add(doc_id, offset, source, dup, inst):
                if inst is None:
                    return
                tokens, positions, labels = inst
                rows["doc_id"].append(doc_id)
                rows["offset"].append(offset)
                rows["source"].append(source)
                rows["dup"].append(dup)
                rows["tokens"].append(tokens)
                rows["masked_positions"].append(positions)
                rows["labels"].append(labels)

            for doc_id, offset, wrong, correct in zip(
                df["doc_id"], df["offset"], df["wrong"], df["correct"]
            ):
                if len(wrong) != len(correct) or not correct:
                    continue
                for dup in range(dupe_factor):
                    if wrong != correct:
                        add(doc_id, offset, "wrong", dup,
                            self._emit_wrong(wrong, correct, dup))
                    add(doc_id, offset, "correct", dup,
                        self._emit_correct(correct, dup))
            return pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "offset": pd.Series(rows["offset"], dtype="int32"),
                    "source": pd.Series(rows["source"], dtype="object"),
                    "dup": pd.Series(rows["dup"], dtype="int32"),
                    "tokens": rows["tokens"],
                    "masked_positions": rows["masked_positions"],
                    "labels": rows["labels"],
                }
            )

    return pairs_ds.map_batches(
        Generate, fn_constructor_kwargs={"ref": probs_ref},
        batch_format="pandas", concurrency=(1, 8),
    )


def write_training_corpus(instances_ds, out_dir: str, seed: int = 12345):
    """Seeded global shuffle + partitioned parquet write of training
    instances — the reference shuffles instances before writing its
    TFRecord shards (create_tf_record.py:593 rng; SURVEY §2.6)."""
    instances_ds.random_shuffle(seed=seed).write_parquet(out_dir)
    return out_dir


def write_tfrecord_corpus(
    instances_ds,
    out_dir: str,
    vocab: dict | None = None,
    max_seq_length: int = 64,
    max_predictions: int = 20,
    seed: int = 12345,
):
    """REAL TFRecord shards of masked-LM instances — the reference's
    serving format (create_tf_record.py:104-180, feature schema
    input_ids / input_mask / segment_ids / masked_lm_positions /
    masked_lm_ids / masked_lm_weights, zero-padded to max_seq_length /
    max_predictions), written without TensorFlow via the pure-Python
    encoder in ``functions/tfrecord.py`` (tf.data.TFRecordDataset-
    compatible framing + Example protos).

    Distributed: seeded shuffle, then each block becomes one shard file
    written inside ``map_batches`` (stateless tasks; one pass, no
    driver materialization).  Returns the shard manifest Dataset."""
    import os
    import uuid

    from .. import datagen
    from ..functions.tfrecord import encode_example, write_tfrecord_file
    from ..functions.tokenization import build_synthetic_vocab

    if vocab is None:
        _, inventory, _ = datagen.static_tables()
        vocab = build_synthetic_vocab(inventory)
    os.makedirs(out_dir, exist_ok=True)
    unk = vocab.get("[UNK]", 1)
    cls_id, sep_id, mask_id = vocab.get("[CLS]", 2), vocab.get("[SEP]", 3), vocab.get("[MASK]", 4)

    def to_ids(tokens):
        return [vocab.get(t, unk) for t in tokens]

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        examples = []
        for tokens, positions, labels in zip(
            df["tokens"], df["masked_positions"], df["labels"]
        ):
            # [CLS] tokens [SEP] framing, as the reference's instances carry
            ids = [cls_id] + to_ids(list(tokens))[: max_seq_length - 2] + [sep_id]
            input_mask = [1] * len(ids)
            pad = max_seq_length - len(ids)
            input_ids = ids + [0] * pad
            input_mask = input_mask + [0] * pad
            segment_ids = [0] * max_seq_length
            # +1: positions shift under the [CLS] prefix
            mpos = [int(p) + 1 for p in positions][:max_predictions]
            mids = to_ids(list(labels))[:max_predictions]
            weights = [1.0] * len(mpos)
            ppad = max_predictions - len(mpos)
            ex = encode_example({
                "input_ids": input_ids,
                "input_mask": input_mask,
                "segment_ids": segment_ids,
                "masked_lm_positions": mpos + [0] * ppad,
                "masked_lm_ids": mids + [0] * ppad,
                "masked_lm_weights": weights + [0.0] * ppad,
            })
            examples.append(ex)
        path = os.path.join(out_dir, f"shard-{uuid.uuid4().hex[:12]}.tfrecord")
        n = write_tfrecord_file(path, examples)
        return pd.DataFrame({"path": [path], "n_examples": pd.Series([n], dtype="int64")})

    return instances_ds.random_shuffle(seed=seed).map_batches(
        write_shard, batch_format="pandas"
    )


_SENT_END = re.compile(r"([。；？！])")


def split_sentences(text: str, max_len: int = 100) -> List[str]:
    """Sentence splitter in the spirit of the reference's cut_line /
    cut_line2 (create_data.py:6-27): split on 。；？！ keeping the
    delimiter; long runs additionally split on commas."""
    parts: List[str] = []
    buf = ""
    for piece in _SENT_END.split(text):
        buf += piece
        if _SENT_END.fullmatch(piece):
            parts.append(buf)
            buf = ""
    if buf:
        parts.append(buf)
    out: List[str] = []
    for p in parts:
        while len(p) > max_len:
            cut = p.rfind("，", 0, max_len)
            if cut <= 0:
                cut = max_len
            out.append(p[: cut + 1] if p[cut] == "，" else p[:cut])
            p = p[cut + 1 :] if p[cut] == "，" else p[cut:]
        if p:
            out.append(p)
    return out


def sentence_split_ds(span_ds):
    """Span rows -> sentence rows (doc_id, offset, sent_idx, sentence)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, offsets, idxs, sents = [], [], [], []
        for doc_id, offset, text in zip(df["doc_id"], df["offset"], df["text"]):
            for i, s in enumerate(split_sentences(text or "")):
                doc_ids.append(doc_id)
                offsets.append(offset)
                idxs.append(i)
                sents.append(s)
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "offset": pd.Series(offsets, dtype="int32"),
                "sent_idx": pd.Series(idxs, dtype="int32"),
                "sentence": sents,
            }
        )

    return span_ds.map_batches(fn, batch_format="pandas")

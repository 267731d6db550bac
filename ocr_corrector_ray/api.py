"""Drop-in embedding API with the reference's surface.

The reference is used as a library via
``corrector = ocr_corrector.initial(); corrector[biz].correct(texts,
probs)`` (/root/reference/README.md:87-93, corrector/__init__.py:20-38,
base_corrector.py:33-48).  This module provides the same call shape so a
user of the reference can switch without touching call sites — backed by
the identical decision logic the distributed pipeline runs (oracle
composition, no Ray session needed).  For corpus-scale work use
``pipelines.correct.corrected_dataset`` instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from . import config as _config
from . import datagen
from .correct import CorrectorConfig, CorrectorResources, build_resources
from .oracle import _correct_page


def _resources_for(cfg: CorrectorConfig, char_meta=None) -> CorrectorResources:
    """Build resources honoring the config's resource-level knobs
    (keywords_file, topn, lm_backend, max_seq_length, lm_batch_size).
    A configured keywords file that cannot be read raises — the reference
    would fail on open() too; a silent fallback would run a whole corpus
    against the wrong keyword set."""
    kws_default, inv, _ = datagen.static_tables()
    kwf = getattr(cfg, "keywords_file", None)
    if kwf and kwf != CorrectorConfig().keywords_file:
        with open(kwf, encoding="utf-8") as f:  # raises on a bad path
            keywords = [line.strip() for line in f if line.strip()]
    else:
        keywords = kws_default
    return build_resources(
        char_meta if char_meta is not None else datagen.build_char_meta(),
        keywords,
        datagen.confusion_rev(),
        inv,
        topn=cfg.topn,
        lm_backend=getattr(cfg, "lm_backend", "synthetic"),
        max_seq_length=cfg.max_seq_length,
        lm_batch_size=getattr(cfg, "lm_batch_size", 16),
    )


class Corrector:
    """Per-biz corrector with the reference's ``correct`` signature.
    Routing is by ``corrector_type`` (keyword vs LM), never by the biz
    name — the reference dispatches the same way
    (corrector/__init__.py:31-37)."""

    def __init__(self, biz_type: str, cfg: CorrectorConfig, res: Optional[CorrectorResources] = None):
        self.biz_type = biz_type
        self.config = cfg
        self.res = res if res is not None else _resources_for(cfg)

    def correct(
        self,
        texts: Sequence[str],
        probs: Optional[Sequence[Optional[Sequence[float]]]] = None,
    ) -> List[str]:
        """Reference semantics: output list order == input list order;
        ``probs=None`` makes every position suspect
        (base_corrector.py:33-48).  A probs list of the wrong length
        raises (the reference silently truncates via zip — a misaligned
        caller would get corrupted results with no signal)."""
        texts = list(texts)
        if probs is None:
            page_probs: List[Optional[List[float]]] = [None] * len(texts)
        else:
            if len(probs) != len(texts):
                raise ValueError(
                    f"probs length {len(probs)} != texts length {len(texts)}"
                )
            page_probs = [list(p) if p is not None else None for p in probs]
        kind = getattr(self.config, "corrector_type", None)
        if kind is None:
            kind = "keyword" if self.biz_type == "report" else "lm"
        biz = "report" if kind == "keyword" else "doc"
        return _correct_page(texts, page_probs, biz, self.res, self.config)


def initial(config=None) -> Dict[str, Corrector]:
    """Build the biz_type -> Corrector registry (``ocr_corrector.initial``
    parity).  The char-meta table is built once and shared; per-corrector
    resources honor each entry's own knobs."""
    registry = _config.initial(config)
    char_meta = datagen.build_char_meta()
    return {
        biz: Corrector(biz, cfg, _resources_for(cfg, char_meta))
        for biz, cfg in registry.items()
    }

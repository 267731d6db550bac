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


class Corrector:
    """Per-biz corrector with the reference's ``correct`` signature."""

    def __init__(self, biz_type: str, cfg: CorrectorConfig, res: Optional[CorrectorResources] = None):
        self.biz_type = biz_type
        self.config = cfg
        if res is None:
            kws, inv, _ = datagen.static_tables()
            res = build_resources(
                datagen.build_char_meta(),
                kws,
                datagen.confusion_rev(),
                inv,
                topn=cfg.topn,
                lm_backend=getattr(cfg, "lm_backend", "synthetic"),
                max_seq_length=cfg.max_seq_length,
            )
        self.res = res

    def correct(
        self,
        texts: Sequence[str],
        probs: Optional[Sequence[Optional[Sequence[float]]]] = None,
    ) -> List[str]:
        """Reference semantics: output list order == input list order;
        ``probs=None`` makes every position suspect
        (base_corrector.py:33-48)."""
        texts = list(texts)
        if probs is None:
            page_probs: List[Optional[List[float]]] = [None] * len(texts)
        else:
            page_probs = [list(p) if p is not None else None for p in probs]
        biz = "report" if self.biz_type == "report" else "doc"
        return _correct_page(texts, page_probs, biz, self.res, self.config)


def initial(config=None) -> Dict[str, Corrector]:
    """Build the biz_type -> Corrector registry (``ocr_corrector.initial``
    parity); shares one resource bundle across correctors."""
    registry = _config.initial(config)
    kws, inv, _ = datagen.static_tables()
    shared = build_resources(datagen.build_char_meta(), kws, datagen.confusion_rev(), inv)
    return {biz: Corrector(biz, cfg, shared) for biz, cfg in registry.items()}

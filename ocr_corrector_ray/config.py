"""Pipeline-builder configuration registry.

Mirrors the reference's ``config/config.json`` surface
(/root/reference/corrector/config/config.json:1-21 and the dynamic
``from_dict`` configs at keyword_corrector.py:26-31 / masked_lm.py:38-43):
a JSON list of per-``biz_type`` corrector configs, instantiated into a
registry keyed by biz_type (corrector/__init__.py:20-38).  Unknown JSON
keys become attributes, preserving the reference's dynamic-schema
behavior.

In this engine a "corrector" is a parameterisation of the one pipeline:
the registry maps biz_type -> CorrectorConfig consumed by the actor
stages; new business types are added by config, new corrector types by
registering a builder callable (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
from typing import Callable, Dict

from .correct import CorrectorConfig

DEFAULT_CONFIG = [
    {
        "biz_type": "report",
        "corrector_type": "keyword",
        "prob_threshold": 0.9,
        "similarity_threshold": 0.55,
    },
    {
        "biz_type": "doc",
        "corrector_type": "lm",
        "prob_threshold": 0.9,
        "max_seq_length": 64,
        "topn": 3,
        "batch_size": 16,
    },
]

_BUILDERS: Dict[str, Callable[[dict], CorrectorConfig]] = {}


def register_corrector_type(name: str, builder: Callable[[dict], CorrectorConfig]) -> None:
    _BUILDERS[name] = builder


# reference config keys -> engine knob names (so the reference's
# config.json vocabulary keeps working)
_KEY_ALIASES = {
    "similarity_threshold": "kw_similarity_threshold",
    "batch_size": "lm_batch_size",
    "key_words_file": "keywords_file",
}


def _build_default(entry: dict) -> CorrectorConfig:
    cfg = CorrectorConfig(
        prob_threshold=entry.get("prob_threshold", 0.9),
        kw_similarity_threshold=entry.get("similarity_threshold", 0.55),
        topn=entry.get("topn", 3),
        max_seq_length=entry.get("max_seq_length", 64),
        curve=entry.get("curve", "02"),
    )
    for key, value in entry.items():
        if key in ("biz_type", "corrector_type"):
            continue
        target = _KEY_ALIASES.get(key, key)
        # aliased/known keys set the real knob; unknown keys become new
        # attributes (from_dict dynamic-schema parity)
        setattr(cfg, target, value)
    # the dispatch key the reference's registry switches on
    # (corrector/__init__.py:31-37) — consumers route keyword-vs-LM by
    # corrector_type, never by the biz name
    cfg.corrector_type = entry.get("corrector_type", "lm")
    return cfg


register_corrector_type("keyword", _build_default)
register_corrector_type("lm", _build_default)
register_corrector_type("bert", _build_default)  # reference name for the LM path


def initial(config=None) -> Dict[str, CorrectorConfig]:
    """Build the biz_type -> config registry (name mirrors the reference's
    ``ocr_corrector.initial()``).  ``config`` may be a path to a JSON file,
    a parsed list, or None for the defaults."""
    if config is None:
        entries = DEFAULT_CONFIG
    elif isinstance(config, str):
        with open(config, encoding="utf-8") as f:
            payload = json.load(f)
        entries = payload.get("correct_config", payload) if isinstance(payload, dict) else payload
    else:
        entries = config
    registry: Dict[str, CorrectorConfig] = {}
    for entry in entries:
        builder = _BUILDERS.get(entry.get("corrector_type", "lm"), _build_default)
        registry[entry["biz_type"]] = builder(entry)
    return registry

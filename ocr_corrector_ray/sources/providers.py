"""OCR-provider connector surface (SURVEY §2.1 S2-S4).

The reference ships a provider dispatcher with one real HTTP connector
(Aliyun) and stubs for Tencent/Huawei/Face++/Baidu
(/root/reference/corrector/api_call/ocr_call.py:21-84, ali_ocr.py:12-53).
This sandbox has no network, so the connector surface here is the plugin
REGISTRY plus a working fixture-backed provider; HTTP providers register
but raise a clear error on use.  In production an HTTP provider would be
invoked from a rate-limited actor-pool ``map_batches`` stage (external
enrichment), never per row on the driver.

Provider contract: ``ocr(payload: bytes | str) -> (texts, probs)`` —
parallel lists, one entry per recognised line, per-char probabilities in
[0, 1] (the parse semantics of ali_ocr.parse_result: char prob / 100).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Tuple

OcrResult = Tuple[List[str], List[List[float]]]

_PROVIDERS: Dict[str, Callable[..., "BaseProvider"]] = {}


class BaseProvider:
    name = "base"

    def ocr(self, payload) -> OcrResult:
        raise NotImplementedError

    def ocr_from_path(self, path: str) -> OcrResult:
        with open(path, "rb") as f:
            return self.ocr(f.read())


def register_provider(name: str, factory: Callable[..., BaseProvider]) -> None:
    _PROVIDERS[name] = factory


def get_call(name: str, **kwargs) -> BaseProvider:
    """Factory dispatcher (ocr_call.get_call parity)."""
    try:
        return _PROVIDERS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown OCR provider {name!r}; known: {sorted(_PROVIDERS)}")


class FixtureProvider(BaseProvider):
    """Reads the saved-prediction JSON format the reference's demo uses
    (``{"texts": [...], "probs": [[...]]}``, demo.py:24-34)."""

    name = "fixture"

    def ocr(self, payload) -> OcrResult:
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        data = json.loads(payload)
        return data["texts"], data.get("probs")

    def ocr_from_path(self, path: str) -> OcrResult:
        with open(path, encoding="utf-8") as f:
            return self.ocr(f.read())


class _NetworkProvider(BaseProvider):
    """Placeholder for the HTTP providers: the registry/dispatch surface is
    real; the call is unavailable without network access."""

    def __init__(self, name: str):
        self.name = name

    def ocr(self, payload) -> OcrResult:
        raise NotImplementedError(
            f"the {self.name!r} OCR connector needs network access, which "
            "this environment does not provide; plug a requests-based "
            "implementation in here (parse per-char probs as prob/100)"
        )


register_provider("fixture", FixtureProvider)
register_provider("own", FixtureProvider)  # the demo's --api=own alias
for _n in ("ali", "tencent", "huawei", "face", "baidu"):
    register_provider(_n, lambda _n=_n: _NetworkProvider(_n))

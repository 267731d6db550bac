"""Demo entry mirroring the reference's demo flow
(/root/reference/demo.py): read a saved OCR prediction
(``<img>_ocr_result.json``) or call a registered provider, run the
correction for the chosen business type, print the diffs.

    python -m ocr_corrector_ray.demo --img corrector/data/1.jpg --biz doc --api own
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--img", required=True, help="image path; <img>_ocr_result.json must exist for --api own")
    ap.add_argument("--biz", required=True, help="business type (doc | report | from config)")
    ap.add_argument("--api", default="own", help="OCR provider name (own/fixture/ali/...)")
    ap.add_argument("--config", default=None, help="optional config JSON path")
    args = ap.parse_args(argv)

    from .api import initial
    from .sources.providers import get_call

    correctors = initial(args.config)
    if args.biz not in correctors:
        print(f"error: unknown biz type {args.biz!r}; known: {sorted(correctors)}", file=sys.stderr)
        return 2

    provider = get_call(args.api)
    if args.api in ("own", "fixture"):
        name, _ = os.path.splitext(args.img)
        result_path = name + "_ocr_result.json"
        if not os.path.exists(result_path):
            print(f"error: saved OCR result not found: {result_path}", file=sys.stderr)
            return 2
        texts, probs = provider.ocr_from_path(result_path)
    else:
        texts, probs = provider.ocr_from_path(args.img)

    if not texts:
        print("error: OCR produced no text", file=sys.stderr)
        return 1

    corrected = correctors[args.biz].correct(texts, probs)
    for original, corr in zip(texts, corrected):
        if original != corr:
            print(f"corrected: {original} -> {corr}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

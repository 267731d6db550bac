"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1-§6).

Produces the table shape from BASELINE.json's input_hint:

    doc_id : string
    biz    : string                      # "doc" (LM path) | "report" (keyword path)
    spans  : list<struct<kind:string, text:string, media_ref:string, offset:int32>>
    probs  : list<list<float32>>         # per text span; null inner list = no
                                         # recogniser confidences (non-prob path)

plus the two broadcast side tables: a synthetic char-meta table (stand-in
for the reference's external char_meta.txt download, README.md:69-74) and
the confusion table that drives both error injection and the synthetic LM.

Everything is seeded and hash-derived — two processes always generate the
identical corpus (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from . import DATA_DIR

# ---------------------------------------------------------------------------
# Closed text inventory
# ---------------------------------------------------------------------------

# Contract-style prose templates ("doc" profile), assembled from the
# reference's fixture/doctest vocabulary (corrector/data/1_ocr_result.json,
# bert_corrector.py:28-34, masked_lm.py:453, README.md:17-38).
TEMPLATES = [
    "本着平等自愿诚信互利的原则一致同意本合同内容并共同遵守",
    "无效重大瑕疵或不符合乙方其他规定的债权资产乙方有权拒绝不予初始登记",
    "我爱北京天安门",
    "国际电台著名主持人",
    "甲方应于每月十五日前向乙方支付当期应付款项",
    "未按时还款将产生逾期费用并计入个人信用记录",
    "请于收到通知后三日内完成确认否则视为自动放弃",
    "双方确认本协议自签署之日起生效",
    "乙方有权自行处置该笔债权资产",
    "借款人应当按照约定的期限返还借款并支付利息",
    "任何一方不得擅自变更或解除本合同",
    "本合同一式两份甲乙双方各执一份具有同等法律效力",
    "如发生争议双方应友好协商解决",
    "贷款用途仅限于生产经营不得挪作他用",
    "保证人承担连带保证责任直至主债务全部清偿",
    "官网公布的利率标准以实际放款日为准",
]

# Confusion pairs (wrong -> right) seeded from the reference's fixtures and
# doctests (FIXTURES.md §5) plus generated coverage pairs added in
# _build_static() below.
SEED_CONFUSIONS: List[Tuple[str, str, float]] = [
    ("白", "自", 0.9), ("暇", "瑕", 0.8), ("子", "予", 0.7), ("大", "天", 0.9),
    ("宋", "未", 0.8), ("全", "金", 0.8), ("数", "逾", 0.6), ("术", "未", 0.5),
    ("郯", "数", 0.5), ("激", "款", 0.6), ("苦", "著", 0.5), ("丰", "主", 0.6),
    ("宫", "官", 0.8), ("代", "贷", 0.5), ("清", "请", 0.4), ("借", "惜", 0.2),
]

# One char deliberately ABSENT from char_meta to pin the reference's
# "unknown chars are skipped in decompose_text" rule (char_sim.py:327-328).
EXCLUDED_CHAR = "囍"

STROKES = "一丨丿㇏丶乛㇇乚亅冫"

_BOILER_NAV = (
    '<nav><a href="/">home</a> <a href="/products">products</a> '
    '<a href="/about">about us</a> <a href="/contact">contact</a></nav>'
)
_BOILER_FOOT = (
    "<footer>copyright 2020 example corp. all rights reserved. "
    '<a href="/terms">terms</a> <a href="/privacy">privacy</a></footer>'
)


def _md5_int(*parts: object) -> int:
    h = hashlib.md5("\x1f".join(str(p) for p in parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big")


def _load_keywords() -> List[str]:
    path = os.path.join(DATA_DIR, "keywords_credit_report.txt")
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def _build_static():
    """Closed inventory + full confusion list (seed pairs + generated
    coverage pairs so most keyword/template chars have a confusion
    partner)."""
    keywords = _load_keywords()
    base_chars = set("".join(TEMPLATES)) | set("".join(keywords))
    base_chars |= set("一二三四五六七八九零")

    confusions = list(SEED_CONFUSIONS)
    used_wrong = {w for w, _, _ in confusions}
    used_right = {r for _, r, _ in confusions}

    # Generated "wrong" glyph pool: deterministic walk of the CJK unified
    # block, skipping anything already in play.
    pool = []
    cp = 0x4E2D
    while len(pool) < 400:
        ch = chr(cp)
        if ch not in base_chars and ch not in used_wrong and ch != EXCLUDED_CHAR:
            pool.append(ch)
        cp += 17
        if cp > 0x9FA5:
            cp = 0x4E01 + (cp - 0x9FA5)
    # give every 3rd inventory char (sorted, deterministic) a confusion partner
    pool_i = 0
    for idx, ch in enumerate(sorted(base_chars)):
        if idx % 3 != 0 or ch in used_right or ch in used_wrong:
            continue
        wrong = pool[pool_i]
        pool_i += 1
        confusions.append((wrong, ch, 0.1 + (idx % 7) / 10.0))
        used_wrong.add(wrong)
        used_right.add(ch)

    inventory = set(base_chars) | used_wrong | used_right
    inventory.discard(EXCLUDED_CHAR)
    return keywords, sorted(inventory), confusions


_STATIC = None


def static_tables():
    """(keywords, inventory, confusions) — computed once per process."""
    global _STATIC
    if _STATIC is None:
        _STATIC = _build_static()
    return _STATIC


# ---------------------------------------------------------------------------
# char meta
# ---------------------------------------------------------------------------

def build_char_meta() -> Dict[str, dict]:
    """Synthetic char-meta dict: every inventory char gets a deterministic
    8-stroke decomposition; each confusion pair differs by exactly one
    stroke (shape similarity 0.875 under 1 - ED/len), non-pairs are
    hash-random (low similarity).  Chains (a char that is 'right' for one
    pair and 'wrong' in another) resolve by deriving wrongs from rights
    iteratively."""
    keywords, inventory, confusions = static_tables()
    wrong_of = {w: r for w, r, _ in confusions}

    def base_decomp(ch: str) -> str:
        rng = random.Random(_md5_int("decomp", ch))
        return "".join(rng.choice(STROKES) for _ in range(8))

    decomp: Dict[str, str] = {}
    # chars that are not 'wrong' in any pair get an independent decomposition
    for ch in inventory:
        if ch not in wrong_of:
            decomp[ch] = base_decomp(ch)
    # derive wrongs from their rights (iterate to settle chains)
    pending = [w for w in wrong_of if w in set(inventory)]
    guard = 0
    while pending and guard < 10:
        nxt = []
        for w in pending:
            r = wrong_of[w]
            if r in decomp:
                d = list(decomp[r])
                pos = _md5_int("mutpos", w) % len(d)
                alt = STROKES[(STROKES.index(d[pos]) + 1 + _md5_int("mutalt", w) % (len(STROKES) - 1)) % len(STROKES)]
                d[pos] = alt
                decomp[w] = "".join(d)
            else:
                nxt.append(w)
        if len(nxt) == len(pending):  # broken chain (right outside inventory)
            for w in nxt:
                decomp[w] = base_decomp(w)
            nxt = []
        pending = nxt
        guard += 1

    syllables = ["ma", "mo", "shi", "li", "bao", "quan", "jin", "tian", "da", "zi", "yu", "huan"]
    meta: Dict[str, dict] = {}
    for ch in sorted(decomp):
        h = _md5_int("pron", ch)
        p1 = syllables[h % len(syllables)] + str(1 + h % 4)
        p2 = syllables[(h // 7) % len(syllables)] + str(1 + (h // 11) % 4)
        pron = f"{p1};{p2}" if h % 5 else f"{p1};null"
        decomps = [decomp[ch]]
        if h % 7 == 0:  # occasional second decomposition variant
            d = list(decomp[ch])
            d[h % 8] = STROKES[(h // 3) % len(STROKES)]
            decomps.append("".join(d))
        meta[ch] = {
            "code_point": f"U+{ord(ch):04X}",
            "pronunciation": pron,
            "decompositions": decomps,
        }
    return meta


def char_meta_table(meta: Optional[Dict[str, dict]] = None) -> pa.Table:
    meta = meta or build_char_meta()
    chars = sorted(meta)
    return pa.table(
        {
            "code_point": [meta[c]["code_point"] for c in chars],
            "char": chars,
            "pronunciation": [meta[c]["pronunciation"] for c in chars],
            "decompositions": pa.array(
                [meta[c]["decompositions"] for c in chars], type=pa.list_(pa.string())
            ),
        }
    )


def confusion_table() -> pa.Table:
    _, _, confusions = static_tables()
    return pa.table(
        {
            "wrong": [w for w, _, _ in confusions],
            "right": [r for _, r, _ in confusions],
            "weight": pa.array([x for _, _, x in confusions], type=pa.float32()),
        }
    )


def confusion_rev() -> Dict[str, List[str]]:
    """wrong -> sorted list of rights (feeds the synthetic LM)."""
    _, _, confusions = static_tables()
    rev: Dict[str, List[str]] = {}
    for w, r, _ in confusions:
        rev.setdefault(w, []).append(r)
    return {k: sorted(set(v)) for k, v in rev.items()}


def injection_map() -> Dict[str, List[str]]:
    """right -> sorted list of wrongs (drives error injection)."""
    _, _, confusions = static_tables()
    fwd: Dict[str, List[str]] = {}
    for w, r, _ in confusions:
        fwd.setdefault(r, []).append(w)
    return {k: sorted(set(v)) for k, v in fwd.items()}


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("biz", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("probs", pa.list_(pa.list_(pa.float32()))),
    ]
)


def _inject_errors(text: str, rng: random.Random, inj: Dict[str, List[str]], p_err: float):
    """Substitute chars with confusion partners; suspect chars get probs
    < 0.9 (strict-< detector threshold), clean chars >= 0.9."""
    chars = list(text)
    probs: List[float] = []
    for i, c in enumerate(chars):
        wrongs = inj.get(c)
        if wrongs and rng.random() < p_err:
            chars[i] = wrongs[rng.randrange(len(wrongs))]
            probs.append(round(0.30 + 0.55 * rng.random(), 4))
        else:
            # keep clean probs strictly above the 0.9 threshold even after the
            # float32 round-trip (float32(0.9) < 0.9 would flip cleanliness)
            probs.append(round(0.9002 + 0.0997 * rng.random(), 4))
    return "".join(chars), probs


def _wrap_html(payload: str, rng: random.Random) -> str:
    extra = '<div class="ad"><a href="/buy">buy now</a> <a href="/sale">sale</a></div>'
    parts = [
        "<html><head><title>t</title><style>.x{color:red}</style></head><body>",
        _BOILER_NAV,
        "<script>var a=1;</script>",
    ]
    if rng.random() < 0.5:
        parts.append(extra)
    parts.append("<div><p>" + payload + "</p></div>")
    parts.append(_BOILER_FOOT)
    parts.append("</body></html>")
    return "".join(parts)


def _wrap_pdf(payload: str, rng: random.Random) -> str:
    chars = list(payload)
    out = []
    for i, c in enumerate(chars):
        out.append(c)
        if i and i % rng.randint(8, 14) == 0:
            out.append("-\n" if rng.random() < 0.3 else "\n")
    if rng.random() < 0.3:
        out.append("\f")
    return "".join(out)


def _make_doc(doc_idx: int, seed: int, keywords, inj) -> Tuple[str, str, list, list]:
    rng = random.Random(_md5_int("doc", seed, doc_idx))
    biz = "report" if rng.random() < 0.35 else "doc"
    if rng.random() < 0.001:
        n_spans = rng.randint(800, 2500)  # skewed long document (salt-split path)
    else:
        n_spans = rng.randint(2, 12)

    spans, probs = [], []
    doc_id = f"doc-{doc_idx:08d}"
    for off in range(n_spans):
        r = rng.random()
        if r < 0.10:  # media span: byte-identical passthrough
            spans.append({"kind": "image", "text": "", "media_ref": f"img://{doc_idx}/{off}", "offset": off})
            probs.append(None)
            continue

        # pick a payload
        u = rng.random()
        if biz == "report":
            kw = keywords[rng.randrange(len(keywords))]
            if u < 0.08:
                payload = kw[: max(1, len(kw) // 2)]  # short fragment (<2 CJK trap)
            else:
                payload = kw
            p_err = 0.35
        else:
            # realistic diversity: spans are fresh combinations of template
            # fragments, so almost every (text, err) pair in the corpus is
            # unique — repeated-span caches must not carry the benchmark
            t1 = TEMPLATES[rng.randrange(len(TEMPLATES))]
            t2 = TEMPLATES[rng.randrange(len(TEMPLATES))]
            cut1 = rng.randint(6, max(7, len(t1) - 1))
            cut2 = rng.randint(4, max(5, len(t2) - 1))
            payload = (t1[:cut1] + t2[len(t2) - cut2 :])[:60]
            if u < 0.05:
                payload = (t1 + t2)[:70]  # > max_seq_length-2 trap
            elif u < 0.10:
                payload = "ref no. AB12"  # ASCII trap (LM filter rejects)
            elif u < 0.14:
                payload = payload[:10] + str(rng.randrange(10)) + payload[10:16]  # digit trap
            elif u < 0.16:
                payload = payload[:6] + EXCLUDED_CHAR + payload[6:12]  # unknown-char trap
            p_err = 0.12 if rng.random() < 0.8 else 0.5  # occasional >3-error spans

        text, p = _inject_errors(payload, rng, inj, p_err)

        r2 = rng.random()
        if r2 < 0.10:
            spans.append({"kind": "html", "text": _wrap_html(text, rng), "media_ref": "", "offset": off})
            probs.append(None)
        elif r2 < 0.20:
            spans.append({"kind": "pdf", "text": _wrap_pdf(text, rng), "media_ref": "", "offset": off})
            probs.append(None)
        else:
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
            # occasionally no recogniser confidences -> non-prob path
            probs.append(None if rng.random() < 0.06 else p)
    return doc_id, biz, spans, probs


def gen_corpus(num_docs: int, seed: int = 42) -> pa.Table:
    """Generate the interleaved-document table (deterministic)."""
    keywords, _, _ = static_tables()
    inj = injection_map()
    doc_ids, bizs, spans_col, probs_col = [], [], [], []
    for i in range(num_docs):
        doc_id, biz, spans, probs = _make_doc(i, seed, keywords, inj)
        doc_ids.append(doc_id)
        bizs.append(biz)
        spans_col.append(spans)
        probs_col.append(probs)
    return pa.table(
        {
            "doc_id": doc_ids,
            "biz": bizs,
            "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
            "probs": pa.array(probs_col, type=pa.list_(pa.list_(pa.float32()))),
        },
        schema=DOC_SCHEMA,
    )


def corpus_path(
    num_docs: int, seed: int = 42, root: str = "/tmp/ocr_ray_corpus", docs_per_file: int = 1000
) -> str:
    """Generate-once parquet cache; returns a DIRECTORY of part files (one
    per ``docs_per_file`` docs) so a distributed read parallelises instead
    of funnelling through a single read task.  Atomic rename makes
    concurrent callers safe."""
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"corpus_s{seed}_n{num_docs}_v3")
    if not os.path.isdir(path):
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for part, start in enumerate(range(0, num_docs, docs_per_file)):
            keywords, _, _ = static_tables()
            inj = injection_map()
            doc_ids, bizs, spans_col, probs_col = [], [], [], []
            for i in range(start, min(start + docs_per_file, num_docs)):
                doc_id, biz, spans, probs = _make_doc(i, seed, keywords, inj)
                doc_ids.append(doc_id)
                bizs.append(biz)
                spans_col.append(spans)
                probs_col.append(probs)
            table = pa.table(
                {
                    "doc_id": doc_ids,
                    "biz": bizs,
                    "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
                    "probs": pa.array(probs_col, type=pa.list_(pa.list_(pa.float32()))),
                },
                schema=DOC_SCHEMA,
            )
            pq.write_table(table, os.path.join(tmp, f"part-{part:05d}.parquet"))
        try:
            os.replace(tmp, path)
        except OSError:
            if not os.path.isdir(path):  # lost a race in some other way
                raise
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return path


def num_docs_for_sf_dir(sf_dir: str, default: int = 500) -> int:
    """Map a testdata dir like /root/testdata/sf0.01 to a corpus size
    (sf0.001 -> 500 docs, sf0.01 -> 5_000, sf0.1 -> 50_000)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return max(10, int(500_000 * float(name[2:])))
        except ValueError:
            pass
    return default

"""Main-content extraction for HTML / PDF spans (new stage, per the
north-star rule — the reference has no extraction stage; its inputs are
already OCR text lines).

Deterministic, dependency-free heuristics (no HTML parser libraries in the
sandbox), designed so that a payload embedded by the corpus generator is
recovered byte-identically, and so the serial oracle and the Ray stage
share one implementation:

HTML (`extract_html`):
  1. drop <script>/<style>/<head>/<nav>/<footer>/<aside> elements wholesale
     (classic boilerplate containers);
  2. convert block boundaries (<br>, </p>, </div>, </li>, </h*>, </tr>) to
     newlines, then strip all remaining tags — anchor text is tagged so a
     per-line link density can be computed (DOM-density heuristic in the
     spirit of Kohlschütter et al., "Boilerplate Detection Using Shallow
     Text Features", WSDM 2010);
  3. unescape the basic entities;
  4. keep a line when it has >=2 CJK chars, or >=25 visible chars with link
     density < 0.5 AND text density (visible chars per inline tag,
     n_vis / (n_tags + 1)) >= 6 — content lines are text-dense,
     nav/footer/widget lines are link- and markup-dense (the
     chars-per-tag form of the DOM-density heuristic);
  5. join kept lines (whitespace-trimmed) with no separator — CJK prose has
     no inter-line whitespace.

PDF (`extract_pdf`): undo layout artifacts: hyphenated line breaks
("-\\n" -> ""), bare line breaks / form feeds removed, runs of spaces
collapsed.
"""

from __future__ import annotations

import re

from . import regexes

_DROP_ELEMENT_RE = re.compile(
    r"<(script|style|head|nav|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_BREAK_RE = re.compile(
    r"<br\s*/?>|</(?:p|div|li|h[1-6]|tr|td|section|article|ul|ol|table)\s*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]
# sentinels for anchor-text accounting; stripped before returning
_A0, _A1 = "\x01", "\x02"
# sentinel marking where an inline (non-block) tag stood, so each line
# keeps its tag count for the text-density rule; stripped before returning
_TAGMARK = "\x03"
# minimum visible chars per inline tag for the length path (content
# lines measure ~7.5-12+ even with a wrapper span; markup-dense
# widget/nav lines fall well under, e.g. 2.7 for per-word spans)
TEXT_DENSITY_MIN = 6.0


def extract_html(html: str) -> str:
    s = _DROP_ELEMENT_RE.sub("", html)
    s = _ANCHOR_RE.sub(lambda m: _A0 + m.group(1) + _A1, s)
    s = _BLOCK_BREAK_RE.sub("\n", s)
    s = _TAG_RE.sub(_TAGMARK, s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)

    kept = []
    for line in s.split("\n"):
        n_tags = line.count(_TAGMARK)
        visible = (
            line.replace(_A0, "").replace(_A1, "").replace(_TAGMARK, "").strip()
        )
        if not visible:
            continue
        n_cjk = regexes.count_chinese(visible)
        if n_cjk >= 2:
            kept.append(visible)
            continue
        # link density: chars inside anchors / all visible chars
        in_link = 0
        depth = 0
        for c in line:
            if c == _A0:
                depth += 1
            elif c == _A1:
                depth = max(0, depth - 1)
            elif depth > 0 and not c.isspace() and c != _TAGMARK:
                in_link += 1
        n_vis = sum(1 for c in visible if not c.isspace())
        if (
            n_vis >= 25
            and in_link / max(1, n_vis) < 0.5
            and n_vis / (n_tags + 1) >= TEXT_DENSITY_MIN
        ):
            kept.append(visible)
    return "".join(kept)


_HYPHEN_BREAK_RE = re.compile(r"-\n")
_SPACE_RUN_RE = re.compile(r" {2,}")


def extract_pdf(text: str) -> str:
    s = _HYPHEN_BREAK_RE.sub("", text)
    s = s.replace("\f", "").replace("\n", "")
    s = _SPACE_RUN_RE.sub(" ", s)
    return s


def extract_span(kind: str, text: str) -> str:
    """Dispatch: html/pdf get extracted; text passes through; media spans
    never reach here (they carry no text)."""
    if kind == "html":
        return extract_html(text)
    if kind == "pdf":
        return extract_pdf(text)
    return text

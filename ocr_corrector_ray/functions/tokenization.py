"""BERT-style tokenization (from-scratch re-implementation of the
reference's tokenizer semantics, /root/reference/corrector/bert_modeling/
tokenization.py):

- ``clean_text``            : tokenization.py:235-246 (drop control chars /
                              U+0000 / U+FFFD, normalise whitespace)
- ``tokenize_chinese_chars``: tokenization.py:200-233 (space-wrap CJK
                              codepoints, incl. the extension ranges)
- ``strip_accents``         : tokenization.py:169-177 (NFD + drop Mn)
- ``split_on_punc``         : tokenization.py:179-198
- ``BasicTokenizer``        : tokenization.py:133-246 (lowercase optional)
- ``WordpieceTokenizer``    : tokenization.py:249-308 (greedy longest-match
                              -first, '##' continuations, [UNK] fallback,
                              max 200 chars/word)
- ``FullTokenizer``         : tokenization.py:107-131 (+ vocab id maps,
                              KeyError on OOV token->id, tokenization.py:90-95)
- ``load_vocab``            : tokenization.py:70-88 (one token per line,
                              insertion-ordered ids)

The reference's 21k-token BERT vocab is model data and is NOT copied;
``build_synthetic_vocab`` derives a vocab from the engine's closed
character inventory so the whole path is exercisable in tests.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List


def load_vocab(path: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            token = line.rstrip("\n")
            if token and token not in vocab:
                vocab[token] = len(vocab)
    return vocab


def build_synthetic_vocab(inventory: Iterable[str]) -> Dict[str, int]:
    """Control tokens + every inventory char + ASCII letters/digits."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "。", "，"]
    tokens += sorted(set(inventory))
    tokens += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += [str(d) for d in range(10)]
    vocab: Dict[str, int] = {}
    for t in tokens:
        if t not in vocab:
            vocab[t] = len(vocab)
    return vocab


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


def is_chinese_char(cp: int) -> bool:
    """CJK codepoint ranges exactly as the reference enumerates them
    (tokenization.py:215-233)."""
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def clean_text(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    return "".join(out)


def tokenize_chinese_chars(text: str) -> str:
    out = []
    for ch in text:
        if is_chinese_char(ord(ch)):
            out.append(" ")
            out.append(ch)
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out)


def strip_accents(text: str) -> str:
    return "".join(
        ch for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )


def split_on_punc(text: str) -> List[str]:
    out: List[List[str]] = []
    start_new = True
    for ch in text:
        if _is_punctuation(ch):
            out.append([ch])
            start_new = True
        else:
            if start_new:
                out.append([])
            start_new = False
            out[-1].append(ch)
    return ["".join(x) for x in out]


class BasicTokenizer:
    def __init__(self, do_lower_case: bool = True):
        self.do_lower_case = do_lower_case

    def tokenize(self, text: str) -> List[str]:
        text = clean_text(text)
        text = tokenize_chinese_chars(text)
        tokens = text.split()
        out: List[str] = []
        for token in tokens:
            if self.do_lower_case:
                token = strip_accents(token.lower())
            out.extend(split_on_punc(token))
        return " ".join(out).split()


class WordpieceTokenizer:
    def __init__(self, vocab: Dict[str, int], unk_token: str = "[UNK]", max_chars: int = 200):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_chars = max_chars

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for token in text.split():
            if len(token) > self.max_chars:
                out.append(self.unk_token)
                continue
            start = 0
            sub_tokens: List[str] = []
            bad = False
            while start < len(token):
                end = len(token)
                cur = None
                while start < end:
                    piece = token[start:end]
                    if start > 0:
                        piece = "##" + piece
                    if piece in self.vocab:
                        cur = piece
                        break
                    end -= 1
                if cur is None:
                    bad = True
                    break
                sub_tokens.append(cur)
                start = end
            out.extend([self.unk_token] if bad else sub_tokens)
        return out


class FullTokenizer:
    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = True):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.basic = BasicTokenizer(do_lower_case)
        self.wordpiece = WordpieceTokenizer(vocab)

    @classmethod
    def from_file(cls, path: str, do_lower_case: bool = True) -> "FullTokenizer":
        return cls(load_vocab(path), do_lower_case)

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for token in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(token))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        # KeyError on OOV, matching the reference (tokenization.py:90-95)
        return [self.vocab[t] for t in tokens]

    def convert_ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.inv_vocab[i] for i in ids]

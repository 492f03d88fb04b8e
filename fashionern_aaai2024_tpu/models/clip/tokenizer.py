"""CLIP BPE tokenizer (open_clip `SimpleTokenizer`-compatible).

Pure-Python lowercased byte-pair encoding producing the exact token ids
the reference's `open_clip.get_tokenizer(...)` yields
(`run/train/train_fiq.py:52`, `run/valid/validate_fiq.py:59`), given the
same merges table. The standard `bpe_simple_vocab_16e6.txt.gz` table is
not redistributed in-repo; `fashionern fetch-bpe` installs it (one-time,
hash-verified) into `models/clip/data/`, and `default_bpe_path()` also
auto-discovers copies from open_clip/clip installs and the HF cache.
Tests pin the algorithm against HF `transformers.CLIPTokenizer` as an
independent oracle plus a real-table fixture when one is available.

Differences from open_clip, documented:
  * `ftfy.fix_text` is skipped when ftfy is unavailable (mojibake repair
    only; identical output for clean ASCII/UTF-8 captions, which is all
    the four benchmarks contain).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, Sequence

import numpy as np

try:  # pragma: no cover
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

try:  # pragma: no cover
    import ftfy

    _fix_text = ftfy.fix_text
except ImportError:  # pragma: no cover
    _fix_text = None

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """Reversible byte ↔ printable-unicode map (GPT-2/CLIP scheme)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


def basic_clean(text: str) -> str:
    if _fix_text is not None:
        text = _fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


BPE_FILENAME = "bpe_simple_vocab_16e6.txt.gz"


def default_bpe_path() -> str | None:
    """Locate the CLIP merges table, searching in order:

    1. `FASHIONERN_BPE_PATH` env var;
    2. this package's data dir (`models/clip/data/`, where
       `fashionern fetch-bpe` installs it) and alongside this module;
    3. an installed `open_clip` / `clip` package (both vendor the file);
    4. the HuggingFace hub cache (any snapshot containing the file).
    """
    p = os.environ.get("FASHIONERN_BPE_PATH")
    if p and os.path.exists(p):
        return p
    here = os.path.dirname(__file__)
    for cand in (os.path.join(here, "data", BPE_FILENAME),
                 os.path.join(here, BPE_FILENAME)):
        if os.path.exists(cand):
            return cand
    for pkg in ("open_clip", "clip"):
        try:
            mod = __import__(pkg)
            cand = os.path.join(os.path.dirname(mod.__file__), BPE_FILENAME)
            if os.path.exists(cand):
                return cand
        except ImportError:
            pass
    import glob

    hf_home = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface")
    )
    hits = glob.glob(
        os.path.join(hf_home, "hub", "**", BPE_FILENAME), recursive=True
    )
    return hits[0] if hits else None


class SimpleTokenizer:
    def __init__(
        self,
        bpe_path: str | None = None,
        merges: Sequence[tuple[str, str]] | None = None,
    ):
        if merges is None:
            bpe_path = bpe_path or default_bpe_path()
            if bpe_path is None:
                raise FileNotFoundError(
                    "No BPE merges table found. Run `fashionern fetch-bpe` "
                    "once (downloads + hash-verifies the canonical "
                    f"{BPE_FILENAME} into the package data dir), or set "
                    "FASHIONERN_BPE_PATH to a copy of it, or pass merges=."
                )
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # CLIP uses merges[1 : 49152-256-2+1]
            merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]
            merges = [m for m in merges if len(m) == 2]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend([SOT_TEXT, EOT_TEXT])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}
        # native (C++) fast path for printable-ASCII texts: identical
        # ids (parity pinned by tests), GIL-free encode; rows the C core
        # flags (entities/unicode/special tokens) re-encode right here
        # in Python, and everything degrades to pure Python when no
        # toolchain exists (native/tokenizer.py)
        self._native = None
        self._native_tried = False
        self._merges = list(merges)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    @property
    def sot_token(self) -> int:
        return self.encoder[SOT_TEXT]

    @property
    def eot_token(self) -> int:
        return self.encoder[EOT_TEXT]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        bpe_tokens: list[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )

    def __call__(
        self, texts: str | Sequence[str], context_length: int = 77
    ) -> np.ndarray:
        """Batch-tokenize like `open_clip.get_tokenizer(...)(texts, 77)`:
        [SOT] tokens [EOT], truncated with the last slot forced to EOT,
        zero-padded. Returns int32 [B, context_length]."""
        if isinstance(texts, str):
            texts = [texts]
        native = self._get_native()
        if native is not None:
            result, fallback = native.encode_batch(list(texts), context_length)
            rows = np.flatnonzero(fallback)
        else:
            result = np.zeros((len(texts), context_length), dtype=np.int32)
            rows = np.arange(len(texts))
        for i in rows:
            tokens = [self.sot_token] + self.encode(texts[i]) + [self.eot_token]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token
            result[i, :] = 0
            result[i, : len(tokens)] = tokens
        return result

    def _get_native(self):
        if not self._native_tried:
            self._native_tried = True
            try:
                from fashionern_aaai2024_tpu.native import tokenizer as nt

                if nt.available():
                    cand = nt.NativeBPE(self._merges)
                    # id-space handshake: the C vocab must line up with
                    # the Python encoder or the handle is refused
                    if (cand.sot_token == self.sot_token
                            and cand.eot_token == self.eot_token):
                        self._native = cand
            except Exception:  # pragma: no cover - any failure → Python
                self._native = None
        return self._native


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(texts: str | Sequence[str], context_length: int = 77) -> np.ndarray:
    return _default_tokenizer()(texts, context_length)

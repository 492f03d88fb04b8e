"""Tokenizer throughput: native C++ BPE vs pure-Python SimpleTokenizer.

The reference tokenizes through open_clip's Python SimpleTokenizer in
every train/eval loop (`/root/reference/run/train/train_fiq.py:52`).
Host-side runs (any machine with g++; no TPU needed):

    PYTHONPATH=/root/repo python benchmarks/topk... tokenizer_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(tok, caps, iters=5):
    tok(caps[:8], 77)  # warm caches
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        tok(caps, 77)
        best = min(best, time.perf_counter() - t0)
    return len(caps) / best


def main():
    from test_clip import _learn_bpe_merges

    from fashionern_aaai2024_tpu.models.clip.tokenizer import SimpleTokenizer

    corpus = open(os.path.join(os.path.dirname(__file__), "..", "tests",
                               "fixtures", "bpe_captions.txt")
                  ).read().splitlines()
    merges = _learn_bpe_merges(corpus, 400)

    # distinct-word captions defeat the word cache (the honest number —
    # real captions repeat words, so production sits between the two)
    cold = [f"caption word{i} style{i*3} color{i*7} fabric{i*11}"
            for i in range(1024)]
    warm = [f"is red with longer sleeves and floral print {i % 7}"
            for i in range(1024)]

    native = SimpleTokenizer(merges=merges)
    python = SimpleTokenizer(merges=merges)
    python._native_tried = True  # pin the pure-Python path

    rows = {}
    for name, caps in (("distinct_words", cold), ("repeating_words", warm)):
        n = bench(native, caps)
        p = bench(python, caps)
        rows[name] = (n, p)
        print(json.dumps({
            "corpus": name,
            "native_captions_per_sec": round(n),
            "python_captions_per_sec": round(p),
            "speedup": round(n / p, 1),
            "native_used": native._get_native() is not None,
        }))


if __name__ == "__main__":
    main()

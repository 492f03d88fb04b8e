"""Record the real-CLIP token-id fixture (run once, commit the output).

Tokenizes every caption in `tests/fixtures/bpe_captions.txt` with the
best available oracle and writes `tests/fixtures/bpe_real_ids.json`:

    {"oracle": "...", "context_length": 77,
     "ids": {caption: [unpadded ids incl. SOT/EOT], ...}}

Oracle preference order:
  1. `open_clip.get_tokenizer("ViT-B-16")` — the exact function the
     reference calls (`/root/reference/run/train/train_fiq.py:52`);
  2. this package's `SimpleTokenizer` over the real merges table
     (requires `fashionern fetch-bpe` first).

`tests/test_clip.py::TestTokenizer::test_real_table_fixture` then pins
our tokenizer to these ids whenever the real table is present. The
fixture could not be recorded in the build environment (no network, no
vendored table) — run this script in any env with open_clip or the
fetched table and commit the JSON.
"""

from __future__ import annotations

import json
import os
import sys


def _captions(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [
            ln.rstrip("\n") for ln in f
            if ln.strip() and not ln.startswith("#")
        ]


def record(fixtures_dir: str, context_length: int = 77) -> str:
    captions = _captions(os.path.join(fixtures_dir, "bpe_captions.txt"))
    oracle = None
    try:
        import open_clip

        hf = open_clip.get_tokenizer("ViT-B-16")

        def ids_of(text: str) -> list[int]:
            row = hf([text], context_length=context_length)[0].tolist()
            # strip zero padding; keep SOT..EOT
            while row and row[-1] == 0:
                row.pop()
            return row

        oracle = "open_clip.get_tokenizer('ViT-B-16')"
    except ImportError:
        from fashionern_aaai2024_tpu.models.clip.tokenizer import (
            SimpleTokenizer, default_bpe_path,
        )

        path = default_bpe_path()
        if path is None:
            raise SystemExit(
                "no oracle available: install open_clip or run "
                "`fashionern fetch-bpe` first"
            )
        tok = SimpleTokenizer(bpe_path=path)

        def ids_of(text: str) -> list[int]:
            row = tok([text], context_length=context_length)[0].tolist()
            while row and row[-1] == 0:
                row.pop()
            return row

        oracle = f"fashionern SimpleTokenizer({path})"

    out = {
        "oracle": oracle,
        "context_length": context_length,
        "ids": {c: ids_of(c) for c in captions},
    }
    dest = os.path.join(fixtures_dir, "bpe_real_ids.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"recorded {len(captions)} captions with {oracle} -> {dest}")
    return dest


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(here)
    record(sys.argv[1] if len(sys.argv) > 1 else
           os.path.join(repo, "tests", "fixtures"))

"""One-time fetch of the CLIP BPE merges table, hash-verified.

The reference gets exact token ids from `open_clip.get_tokenizer`
(`/root/reference/run/train/train_fiq.py:52`), whose package vendors
`bpe_simple_vocab_16e6.txt.gz`. We cannot redistribute that file in this
repo, so `fashionern fetch-bpe` downloads it from the canonical public
mirrors, verifies its SHA-256, and installs it into the package data dir
where `default_bpe_path()` finds it — after which `tokenize()` works with
no environment variables.

Hash policy: `EXPECTED_SHA256` is the widely-published digest of the
canonical file. If the download's digest differs, we refuse to install
and print the actual digest; set `FASHIONERN_BPE_SHA256=<actual>` to
accept a mirror you trust, or `FASHIONERN_BPE_SHA256=skip` to bypass
verification entirely (not recommended).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from fashionern_aaai2024_tpu.models.clip.tokenizer import BPE_FILENAME

# SHA-256 of bpe_simple_vocab_16e6.txt.gz as published alongside the
# OpenAI CLIP / open_clip distributions.
EXPECTED_SHA256 = "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a"

# Canonical mirrors, tried in order.
URLS = (
    "https://openaipublic.azureedge.net/clip/bpe_simple_vocab_16e6.txt.gz",
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
    "https://raw.githubusercontent.com/mlfoundations/open_clip/main/src/open_clip/bpe_simple_vocab_16e6.txt.gz",
)


def default_install_dir() -> str:
    from fashionern_aaai2024_tpu.models.clip import tokenizer as tok

    return os.path.join(os.path.dirname(tok.__file__), "data")


def _sanity_check_table(data: bytes) -> None:
    """Structural check independent of the hash: gunzips, has ≥ the
    48,894 merge lines CLIP consumes, and each is a two-token pair."""
    import gzip
    import io

    text = gzip.GzipFile(fileobj=io.BytesIO(data)).read().decode("utf-8")
    lines = text.split("\n")
    need = 49152 - 256 - 2 + 1
    if len(lines) < need:
        raise ValueError(
            f"merges table too short: {len(lines)} lines < {need}"
        )
    for ln in lines[1:need]:
        if len(ln.split()) != 2:
            raise ValueError(f"malformed merge line: {ln!r}")


def fetch_bpe(dest_dir: str | None = None, timeout: float = 60.0) -> str:
    """Download + verify + install the merges table; returns its path."""
    import urllib.error
    import urllib.request

    dest_dir = dest_dir or default_install_dir()
    dest = os.path.join(dest_dir, BPE_FILENAME)
    if os.path.exists(dest):
        print(f"already installed: {dest}")
        return dest

    data = None
    errors = []
    for url in URLS:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                data = r.read()
            break
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            errors.append(f"{url}: {e}")
    if data is None:
        raise ConnectionError(
            "could not download the BPE merges table from any mirror:\n  "
            + "\n  ".join(errors)
        )

    digest = hashlib.sha256(data).hexdigest()
    expected = os.environ.get("FASHIONERN_BPE_SHA256", EXPECTED_SHA256)
    if expected != "skip" and digest != expected:
        raise ValueError(
            f"SHA-256 mismatch: got {digest}, expected {expected}. "
            "If you trust this mirror, set FASHIONERN_BPE_SHA256="
            f"{digest} and re-run."
        )
    _sanity_check_table(data)

    os.makedirs(dest_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    print(f"installed {dest} ({len(data)} bytes, sha256={digest})")
    return dest


if __name__ == "__main__":
    fetch_bpe()

"""Artifact download / cache helpers.

Capabilities of ref `tokenhmr/lib/utils/download.py` (progress-bar URL
download + cache-or-passthrough) and the spirit of
`/root/reference/fetch_demo_data.sh` (named artifact table).  The released
TokenHMR checkpoints and SMPL body models are registration-gated on the
MPI site, so `fetch()` takes the post-login URL from the user; in a
zero-egress environment every download raises a clear error instead of
hanging.
"""
from __future__ import annotations

import os
import re
import sys
from typing import Callable, Optional
from urllib import request as urlrequest

# Artifact layout the CLIs expect (mirrors fetch_demo_data.sh target paths)
ARTIFACT_PATHS = {
    "tokenhmr_ckpt": "checkpoints/tokenhmr_model_latest.ckpt",
    "tokenizer_ckpt": "checkpoints/tokenizer.pth",
    "smpl_neutral": "body_models/smpl/SMPL_NEUTRAL.pkl",
    "smpl_male": "body_models/smpl/SMPL_MALE.pkl",
    "smpl_female": "body_models/smpl/SMPL_FEMALE.pkl",
}


def _progress_bar(count: int, total: int, bar_len: int = 60) -> None:
    filled = int(round(bar_len * count / float(total)))
    pct = round(100.0 * count / float(total), 1)
    bar = "=" * filled + "-" * (bar_len - filled)
    sys.stdout.write(f"  [{bar}] {pct}% of {total / 1048576:.1f}MB file  \r")
    sys.stdout.flush()
    if count >= total:
        sys.stdout.write("\n")


def download_url(url: str, dst_file_path: str, chunk_size: int = 8192,
                 progress_hook: Optional[Callable] = _progress_bar,
                 timeout: float = 30.0) -> int:
    """Stream `url` to `dst_file_path`; returns bytes written.  A partial
    download never clobbers the destination (tmp-file + rename)."""
    req = urlrequest.Request(url)
    response = urlrequest.urlopen(req, timeout=timeout)
    total = response.info().get("Content-Length")
    total = int(total.strip()) if total is not None else None
    tmp = dst_file_path + ".part"
    written = 0
    with open(tmp, "wb") as f:
        while True:
            chunk = response.read(chunk_size)
            if not chunk:
                break
            written += len(chunk)
            f.write(chunk)
            if progress_hook and total:
                progress_hook(written, total)
    os.replace(tmp, dst_file_path)
    return written


def cache_url(url_or_file: str, cache_file_path: str,
              download: bool = True) -> str:
    """URL -> cached local path (downloading on first use); a non-URL
    argument passes through untouched (ref download.py:50-66)."""
    if re.match(r"^(?:http)s?://", url_or_file, re.IGNORECASE) is None:
        return url_or_file
    if os.path.exists(cache_file_path):
        return cache_file_path
    os.makedirs(os.path.dirname(cache_file_path) or ".", exist_ok=True)
    if download:
        print(f"Downloading remote file {url_or_file} to {cache_file_path}")
        download_url(url_or_file, cache_file_path)
    return cache_file_path


def fetch(name: str, url: str, data_dir: str = "data") -> str:
    """Fetch a named artifact (see ARTIFACT_PATHS) into the standard
    layout.  `url` must be the user's authenticated download link — the
    MPI-hosted checkpoints/body models are registration-gated."""
    if name not in ARTIFACT_PATHS:
        raise KeyError(
            f"unknown artifact {name!r}; expected one of "
            f"{sorted(ARTIFACT_PATHS)}")
    dst = os.path.join(data_dir, ARTIFACT_PATHS[name])
    return cache_url(url, dst)

"""OpenVid-1M dataset downloader
(reference: dataset_download/download_OpenVid.py:6-76): part files with
split-part fallback (`.part-a`/`.part-b` concat), plus CSV metadata.

Zero-egress environments: the download step raises a clear error; the
assembly/verification logic is still usable on pre-fetched files.
"""
from __future__ import annotations

import os
import subprocess
from pathlib import Path
from typing import List

BASE_URL = ("https://huggingface.co/datasets/nkp37/OpenVid-1M/"
            "resolve/main/OpenVid_part{}.zip")
META_URLS = [
    "https://huggingface.co/datasets/nkp37/OpenVid-1M/resolve/main/data/"
    "train/OpenVid-1M.csv",
    "https://huggingface.co/datasets/nkp37/OpenVid-1M/resolve/main/data/"
    "train/OpenVidHD.csv",
]


def _wget(url: str, dest: Path) -> bool:
    try:
        subprocess.check_call(["wget", "-O", str(dest), url])
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        if dest.exists():
            dest.unlink()
        return False


def download_parts(output_dir: str, parts: List[int]) -> List[Path]:
    """Download zip parts; on failure, fall back to split halves and concat
    (reference :28-57)."""
    out = Path(output_dir)
    (out / "download").mkdir(parents=True, exist_ok=True)
    got = []
    for i in parts:
        dest = out / "download" / f"OpenVid_part{i}.zip"
        if dest.exists():
            got.append(dest)
            continue
        if _wget(BASE_URL.format(i), dest):
            got.append(dest)
            continue
        # split-part fallback
        halves = []
        ok = True
        for suffix in ("partaa", "partab"):
            half = out / "download" / f"OpenVid_part{i}.zip.{suffix}"
            if not _wget(BASE_URL.format(i) + f".{suffix}", half):
                ok = False
                break
            halves.append(half)
        if not ok:
            raise RuntimeError(
                f"Failed to download OpenVid part {i} (network egress "
                f"unavailable?). Place files under {out/'download'} manually.")
        with open(dest, "wb") as w:
            for half in halves:
                w.write(half.read_bytes())
                half.unlink()
        got.append(dest)
    return got


def download_metadata(output_dir: str) -> List[Path]:
    out = Path(output_dir) / "data" / "train"
    out.mkdir(parents=True, exist_ok=True)
    files = []
    for url in META_URLS:
        dest = out / url.rsplit("/", 1)[-1]
        if not dest.exists() and not _wget(url, dest):
            raise RuntimeError(f"Failed to download {url}")
        files.append(dest)
    return files

#!/usr/bin/env python
"""Fetch the KNMI precipitation-radar archive behind the KNMI pipeline.

The reference trains on preprocessed KNMI 5-minute radar composites
(/root/reference/convolutional_gat/preprocessing/kmni_dataset/__main__.py:37-123
walks an ``<in_dir>/<year>/<month>/*.h5`` tree and reads
``image1/image_data``), but never ships the raw data or a download path.
This script closes that gap: it pages the KNMI Data Platform Open Data API
(https://dataplatform.knmi.nl) and lays files out exactly the way
``python -m preprocess_kmni preprocess -i <in_dir>`` expects.

Network use is explicit and gated: you need a (free) API key from
https://developer.dataplatform.knmi.nl in ``--api-key`` / ``$KNMI_API_KEY``.
This build environment has zero egress, so the default CI path is
``--dry-run``, which performs NO network I/O and instead synthesizes a
miniature archive with the real files' shape (765x700 uint16 grids,
``image1/image_data``, 65535 NaN sentinel, year/month layout) so the full
fetch -> preprocess -> train recipe in docs/REPRODUCE.md can be exercised
offline end to end.

Usage (real fetch):
    python scripts/fetch_kmni.py --in-dir /data/kmni_raw \
        --start 2016-01 --end 2019-12 --api-key $KNMI_API_KEY
Usage (offline rehearsal):
    python scripts/fetch_kmni.py --in-dir /tmp/kmni_raw --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

API_BASE = "https://api.dataplatform.knmi.nl/open-data/v1"
# 5-minute real-time corrected rainfall composite: 765x700 uint16 grids in
# image1/image_data with the 65535 out-of-image sentinel — the product the
# reference's crop [243:590, 234:512] and sentinel handling assume. Any
# RAD_NL25 5-min product on the same grid works; override with --dataset.
DEFAULT_DATASET = "nl_rdr_data_rtcor"
DEFAULT_VERSION = "1.0"

_TS_RE = re.compile(r"(\d{12})")  # e.g. RAD_NL25_RAC_RT_201601010000.h5


def _parse_month(stamp: str) -> tuple[str, str] | None:
    """Return (year, month) from an archive filename, or None."""
    m = _TS_RE.search(stamp)
    if not m:
        return None
    ts = m.group(1)
    return ts[:4], ts[4:6]


def _month_key(year: str, month: str) -> int:
    return int(year) * 12 + int(month)


def _in_range(fname: str, start: int | None, end: int | None) -> bool:
    ym = _parse_month(fname)
    if ym is None:
        return False
    k = _month_key(*ym)
    if start is not None and k < start:
        return False
    if end is not None and k > end:
        return False
    return True


def _api_get(url: str, api_key: str) -> dict:
    import urllib.request

    req = urllib.request.Request(url, headers={"Authorization": api_key})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _download(url: str, dest: Path) -> None:
    import urllib.request

    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url, timeout=300) as resp, open(tmp, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, dest)


def fetch(in_dir: str, dataset: str, version: str, api_key: str,
          start: int | None, end: int | None, max_files: int | None,
          list_only: bool) -> int:
    """Page the Open Data API and download into <in_dir>/<year>/<month>/."""
    root = Path(in_dir)
    n_done = 0
    start_after = ""
    while True:
        url = (f"{API_BASE}/datasets/{dataset}/versions/{version}/files"
               f"?maxKeys=500&startAfterFilename={start_after}")
        page = _api_get(url, api_key)
        files = page.get("files", [])
        if not files:
            break
        for entry in files:
            fname = entry["filename"]
            start_after = fname
            if not _in_range(fname, start, end):
                continue
            year, month = _parse_month(fname)  # type: ignore[misc]
            dest = root / year / month / fname
            if dest.exists():
                continue
            if list_only:
                print(fname)
            else:
                dest.parent.mkdir(parents=True, exist_ok=True)
                u = _api_get(
                    f"{API_BASE}/datasets/{dataset}/versions/{version}"
                    f"/files/{fname}/url", api_key)
                _download(u["temporaryDownloadUrl"], dest)
                print(f"fetched {dest}")
            n_done += 1
            if max_files is not None and n_done >= max_files:
                return n_done
        if not page.get("isTruncated"):
            break
        time.sleep(0.1)  # stay polite to the API
    return n_done


def iter_api_files(dataset: str, version: str, api_key: str):
    """Yield {filename, size} entries from the Open Data API pager."""
    start_after = ""
    while True:
        url = (f"{API_BASE}/datasets/{dataset}/versions/{version}/files"
               f"?maxKeys=500&startAfterFilename={start_after}")
        page = _api_get(url, api_key)
        files = page.get("files", [])
        if not files:
            return
        for entry in files:
            start_after = entry["filename"]
            yield entry
        if not page.get("isTruncated"):
            return
        time.sleep(0.1)


def check_manifest(in_dir: str, entries, start: int | None,
                   end: int | None) -> dict:
    """Compare on-disk files against the API's listing (pure; offline-
    testable). A partial or truncated fetch would otherwise silently
    produce a *biased* dataset — radar archives are time-ordered, so
    missing tails skew the season mix. Returns {present, missing,
    size_mismatch, extra}; a healthy archive has empty missing and
    size_mismatch lists."""
    root = Path(in_dir)
    expected: dict[str, int | None] = {}
    for entry in entries:
        fname = entry["filename"]
        if not _in_range(fname, start, end):
            continue
        ym = _parse_month(fname)
        if ym is None:
            continue
        expected[str(Path(ym[0]) / ym[1] / fname)] = entry.get("size")
    on_disk = {}
    if root.is_dir():
        for p in root.rglob("*.h5"):
            on_disk[str(p.relative_to(root))] = p.stat().st_size
    missing = sorted(k for k in expected if k not in on_disk)
    size_mismatch = sorted(
        k for k, sz in expected.items()
        if k in on_disk and sz is not None and int(sz) != on_disk[k])
    extra = sorted(k for k in on_disk if k not in expected)
    present = len(expected) - len(missing)
    return {"present": present, "expected": len(expected),
            "missing": missing, "size_mismatch": size_mismatch,
            "extra": extra}


def verify_manifest(in_dir: str, dataset: str, version: str, api_key: str,
                    start: int | None, end: int | None) -> int:
    report = check_manifest(in_dir, iter_api_files(dataset, version,
                                                   api_key), start, end)
    print(f"[verify] {report['present']}/{report['expected']} expected "
          f"files present, {len(report['missing'])} missing, "
          f"{len(report['size_mismatch'])} size mismatches, "
          f"{len(report['extra'])} extra local files")
    for k in report["missing"][:20]:
        print(f"[verify]   missing: {k}")
    for k in report["size_mismatch"][:20]:
        print(f"[verify]   size mismatch: {k}")
    if report["missing"] or report["size_mismatch"]:
        print("[verify] FAIL — the local archive does not match the "
              "API manifest; re-run the fetch (existing files are "
              "skipped) before preprocessing, or the dataset will be "
              "seasonally biased")
        return 1
    print("[verify] OK — local archive matches the API manifest")
    return 0


def synthesize_dry_run(in_dir: str, months: int = 2, frames_per_day: int = 12,
                       days_per_month: int = 2, seed: int = 7) -> int:
    """Write a miniature synthetic archive with the real files' schema.

    Shapes and layout mirror the genuine RAD_NL25 products so the
    preprocess stage (crop -> six 80x80 city patches -> raininess gate)
    exercises every code path: 765x700 uint16, rain blobs placed inside
    the Netherlands crop window, 65535 sentinel ringing the image edge.
    """
    import h5py
    import numpy as np

    rng = np.random.default_rng(seed)
    root = Path(in_dir)
    n = 0
    for mi in range(months):
        year, month = "2016", f"{mi + 1:02d}"
        for day in range(1, days_per_month + 1):
            for fi in range(frames_per_day):
                stamp = f"{year}{month}{day:02d}{fi * 5 // 60:02d}{fi * 5 % 60:02d}"
                dest = root / year / month / f"RAD_NL25_RAC_RT_{stamp}.h5"
                dest.parent.mkdir(parents=True, exist_ok=True)
                img = np.zeros((765, 700), dtype=np.uint16)
                # out-of-image sentinel ring, like the real composites
                img[:8, :] = 65535
                img[-8:, :] = 65535
                # rain cells drifting across the cropped city windows
                for _ in range(30):
                    cx = int(rng.integers(260, 580))
                    cy = int(rng.integers(250, 500))
                    r = int(rng.integers(12, 40))
                    val = int(rng.integers(5, 120))
                    x0, x1 = max(cx - r, 0), min(cx + r, 765)
                    y0, y1 = max(cy - r, 0), min(cy + r, 700)
                    img[x0:x1, y0:y1] = val
                with h5py.File(dest, "w") as f:
                    f.create_group("image1").create_dataset(
                        "image_data", data=img)
                n += 1
    print(f"[dry-run] wrote {n} synthetic radar files under {root} "
          "(no network used)")
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--in-dir", required=True,
                   help="raw-archive root; preprocess_kmni reads this")
    p.add_argument("--dataset", default=DEFAULT_DATASET)
    p.add_argument("--dataset-version", default=DEFAULT_VERSION)
    p.add_argument("--api-key", default=os.environ.get("KNMI_API_KEY", ""))
    p.add_argument("--start", default=None,
                   help="first month to fetch, YYYY-MM (default: all)")
    p.add_argument("--end", default=None,
                   help="last month to fetch, YYYY-MM (default: all)")
    p.add_argument("--max-files", type=int, default=None,
                   help="stop after N files (smoke-testing the fetch)")
    p.add_argument("--list-only", action="store_true",
                   help="print matching filenames, download nothing")
    p.add_argument("--dry-run", action="store_true",
                   help="no network: synthesize a miniature archive with "
                        "the real schema so the recipe runs offline")
    p.add_argument("--verify-manifest", action="store_true",
                   help="compare the local archive against the API's file "
                        "listing (names + sizes); exits 1 on any missing/"
                        "mismatched file so a partial fetch cannot "
                        "silently produce a biased dataset")
    args = p.parse_args(argv)

    def month_arg(s):
        if s is None:
            return None
        y, m = s.split("-")
        return _month_key(y, m)

    if args.dry_run:
        synthesize_dry_run(args.in_dir)
        return 0
    if not args.api_key:
        print("error: no API key. Get a free one at "
              "https://developer.dataplatform.knmi.nl and pass --api-key "
              "or set $KNMI_API_KEY (or use --dry-run for the offline "
              "rehearsal).", file=sys.stderr)
        return 2
    if args.verify_manifest:
        return verify_manifest(args.in_dir, args.dataset,
                               args.dataset_version, args.api_key,
                               month_arg(args.start), month_arg(args.end))
    n = fetch(args.in_dir, args.dataset, args.dataset_version, args.api_key,
              month_arg(args.start), month_arg(args.end), args.max_files,
              args.list_only)
    print(f"{'listed' if args.list_only else 'fetched'} {n} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

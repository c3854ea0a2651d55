"""The reproducibility kit (docs/REPRODUCE.md) runs offline end to end.

scripts/fetch_kmni.py --dry-run synthesizes a miniature raw archive with
the genuine RAD_NL25 schema (765x700 uint16, image1/image_data, 65535
sentinel, year/month layout); the real KNMI preprocess
(extended_gan_tpu/preprocess/kmni.py, parity with the reference's
preprocessing/kmni_dataset/__main__.py) must consume it unmodified, and
the KmniLoader must yield trainable batches from the result.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FETCH = os.path.join(REPO, "scripts", "fetch_kmni.py")


@pytest.fixture(scope="module")
def dry_run_archive(tmp_path_factory):
    raw = tmp_path_factory.mktemp("kmni_raw")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import fetch_kmni

    n = fetch_kmni.synthesize_dry_run(str(raw))
    assert n > 0
    return raw


def test_dry_run_layout_matches_real_schema(dry_run_archive):
    import h5py

    years = sorted(os.listdir(dry_run_archive))
    assert years == ["2016"]
    months = sorted(os.listdir(dry_run_archive / "2016"))
    assert months == ["01", "02"]
    files = sorted(os.listdir(dry_run_archive / "2016" / "01"))
    assert files and all(f.endswith(".h5") for f in files)
    with h5py.File(dry_run_archive / "2016" / "01" / files[0], "r") as f:
        img = f["image1"]["image_data"][...]
    assert img.shape == (765, 700)
    assert img.dtype.name == "uint16"
    assert (img == 65535).any()  # out-of-image sentinel present


def test_preprocess_consumes_dry_run_archive(dry_run_archive, tmp_path):
    from extended_gan_tpu.preprocess import kmni

    out = tmp_path / "pre"
    kmni.preprocess(str(dry_run_archive), str(out), from_year=2016,
                    rain_threshold=0.2)
    kmni.test_split(str(out))
    kmni.get_z_score_normalizing_constants(str(out))

    train = sorted(os.listdir(out / "train"))
    videos = [f for f in train if f.endswith(".pt")]
    assert videos, "raininess gate rejected every synthetic frame"
    meta = json.load(open(out / "train" / "metadata.json"))
    assert meta["max"] <= 65535 and meta["min"] >= 0
    assert (out / "metadata.npz").exists()

    from extended_gan_tpu.data.streaming import KmniLoader

    ld = KmniLoader(2, str(out / "train"), crop=20, time_steps=4,
                    use_native=False)
    x, y = next(iter(ld))
    assert x.shape == (2, 20, 20, 4, 6) and y.shape == x.shape
    assert float(x.max()) > 0  # rain survived crop + normalization


def test_fetch_refuses_silently_keyless_network():
    env = dict(os.environ, KNMI_API_KEY="")
    r = subprocess.run(
        [sys.executable, FETCH, "--in-dir", "/tmp/never-used"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 2
    assert "developer.dataplatform.knmi.nl" in r.stderr


def test_month_range_filter():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import fetch_kmni

    k = fetch_kmni._month_key
    assert fetch_kmni._in_range(
        "RAD_NL25_RAC_RT_201707011230.h5", k("2017", "01"), k("2017", "12"))
    assert not fetch_kmni._in_range(
        "RAD_NL25_RAC_RT_201601010000.h5", k("2017", "01"), None)
    assert not fetch_kmni._in_range("no_timestamp_here.h5", None, None)


def test_verify_manifest_check(tmp_path):
    """check_manifest flags missing files and size mismatches against an
    API listing (pure function — the offline rehearsal of
    --verify-manifest)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import fetch_kmni

    root = tmp_path / "arch"
    names = [f"RAD_NL25_RAC_RT_2016010100{m:02d}.h5" for m in (0, 5, 10)]
    for n in names[:2]:  # third file deliberately missing
        p = root / "2016" / "01" / n
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x" * 100)
    entries = [{"filename": n, "size": 100} for n in names]
    entries[1]["size"] = 999  # deliberate mismatch
    rep = fetch_kmni.check_manifest(str(root), entries, None, None)
    assert rep["expected"] == 3 and rep["present"] == 2
    assert rep["missing"] == ["2016/01/" + names[2]]
    assert rep["size_mismatch"] == ["2016/01/" + names[1]]
    assert rep["extra"] == []

    # month-range filter applies to the manifest too
    k = fetch_kmni._month_key
    rep = fetch_kmni.check_manifest(
        str(root), [{"filename": n, "size": 100} for n in names],
        k("2016", "02"), None)
    assert rep["expected"] == 0
    assert rep["extra"]  # local files outside the range are reported

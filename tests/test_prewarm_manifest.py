"""The r14 prewarm manifest fast-path: a verified-warm corpus skips the
builder pass entirely, and ANY missing snapshot entry falls back to the
full (re)build.  Pure-filesystem logic — no Spark session needed."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_prewarm():
    spec = importlib.util.spec_from_file_location(
        "prewarm_under_test", REPO / "tools" / "prewarm.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["prewarm_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_manifest_warm_and_invalidation(tmp_path, monkeypatch):
    pw = _load_prewarm()
    art = tmp_path / "art"
    art.mkdir()
    monkeypatch.setattr(pw, "ART_ROOT", str(art))

    sf_dir = str(tmp_path / "sfX")
    Path(sf_dir).mkdir()
    key = pw.sf_key(sf_dir)

    # no manifest yet -> cold
    assert not pw._is_warm(sf_dir)

    # two artifacts for this corpus + noise that must stay out of the
    # snapshot (checkpoint scratch, another corpus, the manifest itself)
    (art / f"baskets_v1_{key}").mkdir()
    (art / f"stream_src_{key}").mkdir()
    (art / "chk_rs_stream_tumbling_12345").mkdir()
    (art / "baskets_v1_sfOTHER_deadbeef").mkdir()

    entries = pw._art_entries(sf_dir)
    assert entries == sorted([f"baskets_v1_{key}", f"stream_src_{key}"])

    pw._manifest_path(sf_dir).write_text(json.dumps(entries))
    assert pw._is_warm(sf_dir)

    # deleting ANY snapshot entry re-colds the corpus
    (art / f"stream_src_{key}").rmdir()
    assert not pw._is_warm(sf_dir)
    (art / f"stream_src_{key}").mkdir()
    assert pw._is_warm(sf_dir)

    # corrupt / empty manifests are cold, never a crash
    pw._manifest_path(sf_dir).write_text("not json")
    assert not pw._is_warm(sf_dir)
    pw._manifest_path(sf_dir).write_text("[]")
    assert not pw._is_warm(sf_dir)

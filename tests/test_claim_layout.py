"""claim_layout — the concurrency-safe idempotent layout-promotion
protocol shared by materialize_images / synth_occurrence_jsonl /
_events_day_layout / _str_index_layout.

Regression for an observed race: the former ``out + ".tmp"`` +
``os.replace`` pattern let two first-callers build into the SAME tmp dir
(interleaving their shard files — a potentially doubled corpus under a
valid marker) and crashed the rename loser with ENOTEMPTY. Pure
filesystem tests, no Ray session needed.
"""
from __future__ import annotations

import os
import threading

from laji_pygeoapi_ray.state.spill import claim_layout


def _files(d):
    return sorted(n for n in os.listdir(d) if n != "_DONE")


def test_claim_layout_builds_once_and_is_idempotent(tmp_path):
    out = str(tmp_path / "root" / "layout")
    calls = []

    def build(tmp):
        calls.append(tmp)
        with open(os.path.join(tmp, "part-0"), "w") as f:
            f.write("data")

    assert claim_layout(out, build, marker_text="7") == out
    assert _files(out) == ["part-0"]
    assert open(os.path.join(out, "_DONE")).read() == "7"
    # second call: marker short-circuits, build not re-run
    assert claim_layout(out, build) == out
    assert len(calls) == 1


def test_claim_layout_concurrent_builders_single_corpus(tmp_path):
    """N racing builders: every call returns the same promoted dir, the
    dir contains exactly ONE builder's files (never an interleaving),
    and no builder crashes. A barrier maximizes rename contention."""
    out = str(tmp_path / "race" / "layout")
    n = 8
    barrier = threading.Barrier(n)
    errors = []

    def worker(i):
        def build(tmp):
            # each builder writes a distinctly-named file so a merged
            # (doubled) corpus is detectable
            with open(os.path.join(tmp, f"part-{i}"), "w") as f:
                f.write(str(i))
        try:
            barrier.wait(timeout=30)
            assert claim_layout(out, build) == out
        except Exception as e:          # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    files = _files(out)
    assert len(files) == 1 and files[0].startswith("part-")
    # every loser's tmp dir was cleaned up
    root = os.path.dirname(out)
    assert [d for d in os.listdir(root) if ".tmp." in d] == []


def test_claim_layout_recovers_stale_partial(tmp_path, monkeypatch):
    """A crashed build that left ``out`` WITHOUT a marker (the legacy
    failure mode) is cleared and rebuilt rather than trusted."""
    from laji_pygeoapi_ray.state import spill
    monkeypatch.setattr(spill, "_CLAIM_BACKOFF", (0.0,))
    out = str(tmp_path / "stale" / "layout")
    os.makedirs(out)
    with open(os.path.join(out, "partial"), "w") as f:
        f.write("half-written")

    def build(tmp):
        with open(os.path.join(tmp, "good"), "w") as f:
            f.write("ok")

    assert claim_layout(out, build) == out
    assert _files(out) == ["good"]
    assert os.path.exists(os.path.join(out, "_DONE"))


def test_claim_layout_build_failure_cleans_tmp(tmp_path):
    out = str(tmp_path / "fail" / "layout")

    def build(tmp):
        raise RuntimeError("boom")

    try:
        claim_layout(out, build)
        raise AssertionError("build error must propagate")
    except RuntimeError:
        pass
    root = os.path.dirname(out)
    assert [d for d in os.listdir(root) if ".tmp." in d] == []
    assert not os.path.exists(out)

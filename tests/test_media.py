"""Video frame-sample + audio feature actor stages (deterministic fake
codecs; the Ray-side plumbing — schema, small batches, degrade rows — is
what's under test)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from laji_pygeoapi_ray.stages import media


def _video_table(n=6, frames=8):
    return pa.table({
        "video_id": pa.array(range(n), pa.int64()),
        "bytes": pa.array([media.synth_video(i, n_frames=frames)
                           for i in range(n)], pa.binary()),
        "n_frames": pa.array([frames] * n, pa.int32()),
    })


def test_frame_sample_stage_explodes_rows():
    ds = ray.data.from_arrow(_video_table())
    out = ds.map_batches(media.FrameSampleStage,
                         fn_constructor_kwargs={"stride": 2},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1, num_cpus=1).to_pandas()
    # 6 clips x 8 frames / stride 2 = 24 rows, frame_idx 0,2,4,6 each
    assert len(out) == 24
    assert sorted(out[out["video_id"] == 0]["frame_idx"]) == [0, 2, 4, 6]
    # deterministic: same clip -> same hashes across runs
    out2 = ray.data.from_arrow(_video_table()).map_batches(
        media.FrameSampleStage, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", batch_size=4, concurrency=1,
        num_cpus=1).to_pandas()
    a = out.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    assert (a["frame_hash"] == b["frame_hash"]).all()


def test_frame_sample_degrades_on_corrupt_clip():
    t = _video_table(3)
    bad = t.set_column(1, "bytes", pa.array(
        [t["bytes"][0].as_py(), b"garbage", t["bytes"][2].as_py()],
        pa.binary()))
    out = ray.data.from_arrow(bad).map_batches(
        media.FrameSampleStage, batch_format="pyarrow",
        concurrency=1, num_cpus=1).to_pandas()
    assert set(out["video_id"]) == {0, 2}     # clip 1 skipped, run survives
    import pytest
    with pytest.raises(Exception):
        ray.data.from_arrow(bad).map_batches(
            media.FrameSampleStage, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", concurrency=1, num_cpus=1).to_pandas()


def test_audio_feature_stage():
    n = 5
    t = pa.table({
        "audio_id": pa.array(range(n), pa.int64()),
        "bytes": pa.array([media.synth_audio(i) for i in range(n)],
                          pa.binary()),
    })
    out = ray.data.from_arrow(t).map_batches(
        media.AudioFeatureStage, batch_format="pyarrow",
        batch_size=2, concurrency=1, num_cpus=1).to_pandas()
    assert len(out) == n and out["decode_ok"].all()
    assert "bytes" not in out.columns          # payload dropped post-decode
    assert (out["rms"] > 1000).all()           # sine mix amplitude ~12k
    assert out["zcr"].between(0.001, 0.5).all()
    # different keys -> different dominant frequency -> different zcr
    assert out["zcr"].nunique() == n

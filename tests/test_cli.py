"""CLI (``python -m laji_pygeoapi_ray``) lifecycle smoke — the ``ray job
submit`` surface the north rule names. Runs in ONE subprocess (main()
owns and shuts down its Ray session, so it cannot run against the
suite's session fixture): etl → maintenance → query → get, asserting
each command's JSON contract."""
from __future__ import annotations

import json
import subprocess
import sys


def test_cli_lifecycle_subprocess():
    script = r'''
import json, sys, io, contextlib, tempfile, shutil
sys.path.insert(0, "/root/repo")
from laji_pygeoapi_ray.__main__ import main
out_dir = tempfile.mkdtemp(prefix="cli_lifecycle_")
try:
    for argv in (["--num-cpus", "8", "etl",
                  "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir],
                 ["--num-cpus", "8", "maintenance", "--out", out_dir],
                 ["--num-cpus", "8", "query", "--out", out_dir,
                  "--bbox", "60.0,24.6,60.4,25.3"],
                 ["--num-cpus", "8", "get", "--id",
                  "http://tun.fi/JX.42_0"]):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(argv)
        line = buf.getvalue().strip().splitlines()[-1]
        print(json.dumps({"rc": rc, "out": json.loads(line)}))
finally:
    shutil.rmtree(out_dir, ignore_errors=True)
'''
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(ln) for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 4, proc.stdout
    etl, maint, query, get = lines
    assert etl["rc"] == 0 and etl["out"]["shards_done"] == 4
    assert maint["rc"] == 0 and maint["out"]["total"] > 0 \
        and maint["out"]["collections"] == 21
    assert query["rc"] == 0 and query["out"]["rows"] > 0
    sample = query["out"]["sample"][0]
    assert {"image_id", "x", "y", "province", "municipality"} <= set(sample)
    assert get["rc"] == 0 and get["out"].get("doc_id") == 42

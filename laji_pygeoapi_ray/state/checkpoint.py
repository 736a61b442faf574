"""Checkpoint manifest — per-partition lineage + metrics + resume.

The reference's recovery story is coarse (a ``last_update`` watermark +
idempotent append-then-dedup, ``edit_db.py:32-66,333-379``; a crashed run
re-runs whole provinces). The engine upgrades it per SURVEY.md §4: the run
manifest records, per input shard, its lineage (input files, transform
version), row counters (the reference's processed/edited/converted summary,
``main.py:261-268``), and a done marker; a resumed run skips finished
shards. Output stays correct because the maintenance pass (dedup
keep-first) commutes with re-appends — exactly-once-equivalent
(tests/test_etl_resume.py asserts resumed == clean)."""
from __future__ import annotations

import json
import os
import time


def atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


class RunManifest:
    """JSON manifest at ``<out_dir>/manifest.json``."""

    def __init__(self, out_dir: str, transform_version: str):
        self.path = os.path.join(out_dir, "manifest.json")
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)
            if self.data.get("transform_version") != transform_version:
                # lineage mismatch → all shards stale
                self.data = self._fresh(transform_version)
        else:
            self.data = self._fresh(transform_version)

    @staticmethod
    def _fresh(tv: str) -> dict:
        return {"transform_version": tv, "last_update": None,
                "shards": {}, "counters": {}}

    def save(self) -> None:
        atomic_write_json(self.path, self.data)

    def is_done(self, shard_id: str) -> bool:
        s = self.data["shards"].get(shard_id)
        return bool(s and s.get("status") == "done")

    def mark_done(self, shard_id: str, *, input_files: list[str],
                  rows: int, counters: dict | None = None) -> None:
        self.data["shards"][shard_id] = {
            "status": "done",
            "input_files": sorted(input_files),
            "rows": rows,
            "counters": counters or {},
            "finished_unix": time.time(),
        }
        self.save()

    def set_counters(self, counters: dict) -> None:
        self.data["counters"] = counters
        self.data["last_update"] = time.strftime("%Y-%m-%d")
        self.save()


def render_error_report(manifest_data: dict, *, context: str = "bulk ETL",
                        timestamp: str | None = None) -> str | None:
    """The ``send_error_email`` analogue (no SMTP in this environment):
    render the failed-shard records of a run manifest into the reference's
    notification body shape (``send_error_emails.py:23-36``) — context,
    error type/message per failure, timestamp, lineage. Returns None when
    the run had no failures (the reference also skips sending then)."""
    failed = {sid: s for sid, s in manifest_data.get("shards", {}).items()
              if s.get("status") == "failed"}
    if not failed:
        return None
    lines = [f"Subject: [Laji-PyGeoAPI Error] {context}", "",
             "Error occurred when loading data to the engine:", "",
             f"Context: {context}",
             f"Timestamp: {timestamp}",
             f"Failed shards: {len(failed)}", ""]
    for sid, s in sorted(failed.items()):
        lines += [f"- {sid}: {s.get('error', '?')}",
                  f"  input_files: {', '.join(s.get('input_files', []))}"]
    return "\n".join(lines)

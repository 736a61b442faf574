"""Request audit log — the engine-side analogue of the reference's
``RequestLog`` table + ``print_log`` CLI command
(``src/models.py:4-11``, ``src/commands/print_log.py``).

The reference logs every HTTP request (status, date, api key, path, query
string, ip) into SQLAlchemy; this engine serves batch queries, so the log
is an append-only JSONL file per serving process — same fields, same
``print_log`` ordering (latest N, oldest first). JSONL appends are atomic
at line granularity (O_APPEND), so concurrent query processes can share
one log file.
"""
from __future__ import annotations

import json
import os


def log_request(log_path: str, *, path: str, query_string: str,
                status_code: int = 200, api_key_id: str | None = None,
                ip_address: str = "local", date: str | None = None) -> None:
    """Append one request record. ``date`` must be an explicit RFC3339
    string — the batch engine has no implicit wall clock (determinism
    discipline); serving wrappers pass their own now()."""
    rec = {"status_code": status_code, "date": date,
           "api_key_id": api_key_id, "path": path,
           "query_string": query_string, "ip_address": ip_address}
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    with open(log_path, "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")


def read_log(log_path: str, limit: int = 100) -> list[dict]:
    """Latest ``limit`` records, oldest first (print_log.py:14-22)."""
    if not os.path.exists(log_path):
        return []
    with open(log_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    return rows[-limit:]


def format_log(rows: list[dict]) -> str:
    """The print_log table rendering (header + aligned columns)."""
    header = ["Status", "Date", "Api key", "Path", "Query", "Ip address"]
    table = [header] + [
        [str(r["status_code"]), str(r["date"]), str(r["api_key_id"]),
         r["path"], r["query_string"], r["ip_address"]] for r in rows]
    widths = [max(len(row[i]) for row in table)
              for i in range(len(header))]
    return "\n".join("  ".join(c.ljust(w) for c, w in zip(row, widths))
                     for row in table)

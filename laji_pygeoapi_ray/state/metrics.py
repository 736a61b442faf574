"""Streaming per-stage row metrics — counters without materialization.

A composed pipeline (``pipelines/corpus.py``) wants per-gate row counts
("input / after_quality / after_dedup") for its manifest. Counting with
``ds.materialize(); ds.count()`` pins the full decoded table in the
object store once per counter — at 100 TB that is two extra full passes
of spill pressure purely to fill two dict entries.

Instead: a zero-CPU counter actor receives one fire-and-forget
increment per *block* (``batch_size=None`` → batch == block, so the
actor sees thousands of tiny messages, not one per 512-row batch) from
inside the existing streaming stages; the pipeline is consumed ONCE
end-to-end by its real sink and the counters are read afterwards.

Caveat (by design): these are *metrics*, not lineage — a Ray task retry
re-sends its block's increment. Exact row accounting for correctness
gates lives in the sink manifest / oracle queries, mirroring how the
reference logs progress counters alongside its DB commits
(``/root/reference/pygeoapi/scripts/main.py`` run summary) without
making them transactional.
"""
from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class RowCounter:
    """Named monotonic counters; one instance per pipeline run."""

    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self._c[key] = self._c.get(key, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self._c)


class StageMetrics(dict):
    """Dict of stage-name → row count, filled after the pipeline's single
    consumption. ``counted(ds, key)`` interposes a pass-through counting
    stage; ``resolve()`` drains the actor (re-reading until the counts
    stabilise, since increments are fire-and-forget)."""

    def __init__(self, actor=None) -> None:
        super().__init__()
        self._actor = actor if actor is not None else RowCounter.remote()

    def counted(self, ds, key: str):
        actor = self._actor

        def tally(t):
            actor.add.remote(key, len(t))
            return t

        return ds.map_batches(tally, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    def resolve(self, timeout: float = 10.0) -> "StageMetrics":
        import time

        prev: dict | None = None
        deadline = time.monotonic() + timeout
        while True:
            cur = ray.get(self._actor.get.remote())
            if cur == prev or time.monotonic() > deadline:
                break
            prev = cur
            time.sleep(0.05)
        self.clear()
        self.update(cur)
        return self

"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray itself before importing this module; nothing here
(or in ``laji_pygeoapi_ray``) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship pipeline on /root/testdata/sf0.001.
- ``queries()``     — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()``  — DuckDB oracle per query (exact float64/BIGINT twins of
                      the Ray kernels; see laji_pygeoapi_ray.functions.*).
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: image+caption table → decode/PSNR-verify →
    derive point → tile → PIP-label regions → local id."""
    from laji_pygeoapi_ray.pipelines.flagship import flagship_images
    return flagship_images(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from laji_pygeoapi_ray.pipelines.registry import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    from laji_pygeoapi_ray.pipelines.registry import all_oracle_sql
    return all_oracle_sql()

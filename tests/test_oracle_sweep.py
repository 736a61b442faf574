"""Full oracle sweep — the driver's correctness gate, in pytest.

The driver's CORRECTNESS_r{N}.json window covers at most ~50 registered
queries per round; this sweep runs EVERY oracle-bearing query against
its DuckDB twin at the driver's own scale factor (sf0.01), so each one
carries machine-checkable proof regardless of where it lands in the
driver's window. One parametrized test per query — a failure names the
query directly.

Cross-scale mode: ``LAJI_SWEEP_SF_DIR=/root/testdata/sf0.1 pytest
tests/test_oracle_sweep.py`` re-runs the whole sweep at another scale
factor (run once per round; it caught the T=64 SRP-LSH recall miss that
sf0.01 was too small to expose, and the PHASH_SUB corpus-floor
truncation that only sf0.001 could expose). The image-family queries'
oracle SQL strings embed the fixed sf0.01 image-corpus path
(``image_queries.ORACLE_N`` — a static SQL string cannot receive
``sf_dir``); in cross-scale mode the sweep REWRITES that path to the
sweep sf's corpus (image content is index-deterministic, so the
rewritten oracle is the correct twin), so the pinned set is
value-checked at every scale factor too — no skips.
"""
from __future__ import annotations

import os

import pytest

from tests.conftest import SF_ORACLE, assert_query_matches_oracle

SF_SWEEP = os.environ.get("LAJI_SWEEP_SF_DIR", SF_ORACLE)

# Oracle pinned to the ORACLE_N=2000 (sf0.01) image corpus — in
# cross-scale mode their SQL is REWRITTEN to the sweep sf's corpus path
# (valid because image content is index-deterministic). The other image
# queries — image_phash_components, image_phash_hamming_sub — restrict
# themselves to a fixed img_no subset (corpus floored at PHASH_SUB), so
# their unrewritten oracle is already sf-invariant.
IMAGE_PINNED = frozenset({
    "aspect_ratio_histogram", "caption_integrity", "caption_stats",
    "cell_image_doc_join", "cross_k_image_doc", "dedup_method_agreement",
    "dwithin_image_doc_pairs", "etl_lifecycle_bbox", "image_augment_stats",
    "image_compression_stats", "image_content_dedup", "image_decode_verify",
    "image_hash_topk_certified", "image_municipality_counts",
    "image_neardup_psnr_verified", "image_patch_stats", "image_phash_dedup",
    "image_phash_hamming_pairs", "image_resize_plan", "image_tile_counts",
    "image_transcode_verify", "phash_threshold_sweep", "tile_mosaic_layout",
    "training_corpus_counts", "zonal_image_stats",
})


def _oracle_names() -> list[str]:
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return sorted(e.oracle_sql())


def _pinned_rewrite(sql: str) -> str:
    """Repoint the fixed sf0.01 image-corpus path to the sweep sf's corpus
    (materialized by the engine side, which runs first in the compare)."""
    from laji_pygeoapi_ray.pipelines import image_queries as iq
    from laji_pygeoapi_ray.sources.images import CONTENT_VERSION as cv

    n = iq.n_images_for(SF_SWEEP)
    return sql.replace(f"/n{iq.ORACLE_N}v{cv}/", f"/n{n}v{cv}/")


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_sweep(name: str):
    transform = (_pinned_rewrite
                 if SF_SWEEP != SF_ORACLE and name in IMAGE_PINNED
                 else None)
    assert_query_matches_oracle(name, SF_SWEEP, sql_transform=transform)

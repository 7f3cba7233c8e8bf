"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pages(tmp_path_factory):
    """Small deterministic pages corpus + queries (FIXTURES.md t1 tier)."""
    from rse_ray.sources.fixtures import generate_pages, generate_queries

    root = tmp_path_factory.mktemp("fixtures")
    pages_dir = root / "pages"
    generate_pages(str(pages_dir), n_rows=500, n_dup_pairs=10, seed=42)
    queries = generate_queries(n=60, seed=42)
    return {"pages_dir": str(pages_dir), "queries": queries}

"""Session-scoped Ray fixture — one Ray session for the whole pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """sf0.001 synthetic web-pages corpus + oracle goldens (cached in /tmp)."""
    from portuguese_pt_legal_ner_ray.oracle import ensure_goldens
    from portuguese_pt_legal_ner_ray.corpus import corpus_dir

    ensure_goldens(0.001)
    return corpus_dir(0.001)

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
def mini_run(ray_session, tmp_path_factory):
    """200-page corpus (4 shards) -> pipeline run + oracle goldens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.oracle import run_oracle
    from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_pipeline

    root = tmp_path_factory.mktemp("mini")
    inp = root / "webpages"
    inp.mkdir()
    tables = [gen_pages_shard(s, s * 50, 50) for s in range(4)]
    for s, t in enumerate(tables):
        pq.write_table(t, inp / f"part-{s:05d}.parquet")
    pages = pa.concat_tables(tables)
    golden = run_oracle(pages)
    out = root / "out"
    run_kg_pipeline(inp, out, num_partitions=4)
    return {"input": inp, "out": out, "golden": golden, "pages": pages, "root": root}


@pytest.fixture(scope="session")
def small_corpus():
    """sf0.001 synthetic web-pages corpus + oracle goldens (cached in /tmp)."""
    from portuguese_pt_legal_ner_ray.oracle import ensure_goldens
    from portuguese_pt_legal_ner_ray.corpus import corpus_dir

    ensure_goldens(0.001)
    return corpus_dir(0.001)

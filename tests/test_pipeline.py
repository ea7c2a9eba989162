"""End-to-end parity: Ray pipeline output == single-process oracle output
(SURVEY.md §5 test 1 — the core acceptance test). Expected equality is exact
(P/R = 1.0) because pipeline and oracle share the deterministic tagger."""

import shutil
from pathlib import Path

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
from portuguese_pt_legal_ner_ray.oracle import run_oracle
from portuguese_pt_legal_ner_ray.pipelines.kg import graph_stage, run_kg_pipeline
from portuguese_pt_legal_ner_ray.config import PipelineConfig

TABLE_COLS = {
    "spans": ["url", "para_idx", "start", "end", "label", "surface"],
    "triples": ["subj", "pred", "obj", "subj_label", "obj_label", "url", "para_idx"],
    "nodes": ["entity_id", "canonical_surface", "label", "n_mentions"],
    "edges": ["subj_id", "pred", "obj_id", "weight"],
}


def _sorted(t, cols):
    t = t.select(cols)
    return t.sort_by([(c, "ascending") for c in cols])


def _assert_table_equal(out_dir, golden, name):
    got = _sorted(pads.dataset(Path(out_dir) / "graph" / name).to_table(), TABLE_COLS[name])
    want = _sorted(golden[name], TABLE_COLS[name])
    assert got.num_rows == want.num_rows, name
    assert got.equals(want.cast(got.schema)), f"{name} table mismatch"




def test_extracted_text_byte_identity(mini_run):
    got = pads.dataset(mini_run["out"] / "extracted").to_table()
    by_url = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
    pages = mini_run["pages"]
    for url, text in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
        assert by_url[url] == text  # byte-identical per url (input_hint invariant)


def test_paragraphs_match_oracle(mini_run):
    got = pads.dataset(mini_run["out"] / "extraction").to_table()
    got = _sorted(got, ["url", "para_idx", "para_text"])
    want = _sorted(mini_run["golden"]["paragraphs"], ["url", "para_idx", "para_text"])
    assert got.equals(want.cast(got.schema))


@pytest.mark.parametrize("name", list(TABLE_COLS))
def test_graph_tables_match_oracle(mini_run, name):
    _assert_table_equal(mini_run["out"], mini_run["golden"], name)


def test_triple_set_precision_recall(mini_run):
    """The north-rule metric: (subj, pred, obj) set P/R >= 0.95 (here 1.0)."""
    got_t = pads.dataset(mini_run["out"] / "graph" / "triples").to_table()
    got = set(zip(got_t["subj"].to_pylist(), got_t["pred"].to_pylist(), got_t["obj"].to_pylist()))
    g = mini_run["golden"]["triples"]
    want = set(zip(g["subj"].to_pylist(), g["pred"].to_pylist(), g["obj"].to_pylist()))
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # deterministic shared tagger


def test_distributed_cc_matches_driver(mini_run):
    """Label-propagation CC (pure Dataset algebra) == driver union-find."""
    alt = mini_run["root"] / "out_distcc"
    if not alt.exists():
        shutil.copytree(mini_run["out"], alt)
    graph_stage(alt, PipelineConfig(), force_distributed_cc=True)
    for name in ("nodes", "edges"):
        _assert_table_equal(alt, mini_run["golden"], name)


def test_bench_pipeline_matches_oracle(mini_run):
    """run_kg_bench (the fused throughput path) == oracle on nodes/edges."""
    from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_bench

    out = mini_run["root"] / "out_bench"
    run_kg_bench(mini_run["input"], out)
    for name in ("nodes", "edges"):
        _assert_table_equal(out, mini_run["golden"], name)


def test_resume_after_injected_failure(ray_session, mini_run, tmp_path):
    out = tmp_path / "out_resume"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_kg_pipeline(mini_run["input"], out, num_partitions=4, fail_after_partitions=2)
    from portuguese_pt_legal_ner_ray.state.manifest import Manifest

    m = Manifest(out)
    done_before = {r["partition"] for r in m.all_records() if r["stage"] == "extract"}
    assert len(done_before) == 2
    # mark completion times, resume, verify completed partitions were skipped
    times_before = {
        r["partition"]: r["completed_at"] for r in m.all_records() if r["stage"] == "extract"
    }
    run_kg_pipeline(mini_run["input"], out, num_partitions=4)
    times_after = {
        r["partition"]: r["completed_at"]
        for r in Manifest(out).all_records()
        if r["stage"] == "extract"
    }
    for p in done_before:
        assert times_after[p] == times_before[p], "completed partition was recomputed"
    for name in TABLE_COLS:
        _assert_table_equal(out, mini_run["golden"], name)

def test_bench_distributed_link_matches_oracle(mini_run, monkeypatch):
    """run_kg_bench with the driver-collect cap forced tiny must take the
    stage-based distributed link path (no driver to_pandas of mentions) and
    still produce byte-identical nodes/edges (VERDICT r3 item #3)."""
    from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_bench
    from portuguese_pt_legal_ner_ray.stages import linking as linking_mod

    monkeypatch.setattr(linking_mod, "DRIVER_CC_MAX_KEYS", 10)
    out = mini_run["root"] / "out_bench_dist"
    res = run_kg_bench(mini_run["input"], out)
    assert res["link_path"] == "distributed"
    for name in ("nodes", "edges"):
        _assert_table_equal(out, mini_run["golden"], name)


def test_ner_remote_args_reach_map_batches(mini_run, tmp_path, monkeypatch):
    """cfg.ner_ray_remote_args must be splatted into the NER map_batches call
    (SURVEY.md §2.3 A1 num_gpus mapping; VERDICT r3 item #4)."""
    import ray.data

    from portuguese_pt_legal_ner_ray.pipelines.kg import (
        extract_partition,
        ner_map_batches_kwargs,
    )
    from portuguese_pt_legal_ner_ray.stages.extract import NerTripleStage

    # pure-unit: a GPU claim lands in the kwargs (never actually scheduled
    # here — this sandbox has no GPU)
    kw = ner_map_batches_kwargs(PipelineConfig(ner_ray_remote_args={"num_gpus": 0.25}))
    assert kw["num_gpus"] == 0.25 and kw["batch_size"] == PipelineConfig().ner_batch_size

    # wiring: the kwargs reach the actual Dataset.map_batches call for the
    # NER stage (spy on the method, run one real partition with a
    # satisfiable claim)
    recorded: dict = {}
    orig = ray.data.Dataset.map_batches

    def spy(self, fn, **kwargs):
        if fn is NerTripleStage:
            recorded.update(kwargs)
        return orig(self, fn, **kwargs)

    monkeypatch.setattr(ray.data.Dataset, "map_batches", spy)
    files = sorted(str(p) for p in Path(mini_run["input"]).glob("*.parquet"))[:1]
    cfg = PipelineConfig(ner_ray_remote_args={"num_cpus": 1})
    extract_partition(files, tmp_path / "out_remote_args", "00000", cfg)
    assert recorded.get("num_cpus") == 1
    assert recorded.get("batch_size") == cfg.ner_batch_size


def test_ner_remote_args_reject_reserved_keys():
    """ner_ray_remote_args is placement-only (excluded from the resume
    fingerprint): output-affecting keys must be rejected, or a silent
    override would resume past stale partitions (ADVICE r4 #3)."""
    import pytest

    from portuguese_pt_legal_ner_ray.pipelines.kg import ner_map_batches_kwargs

    for bad in ("batch_format", "batch_size", "concurrency",
                "fn_constructor_kwargs"):
        with pytest.raises(ValueError, match="reserved"):
            ner_map_batches_kwargs(
                PipelineConfig(ner_ray_remote_args={bad: 1}))
    # placement keys still pass through (ner_concurrency pinned so the
    # check stays a pure unit test — no ray.cluster_resources() needed)
    kw = ner_map_batches_kwargs(
        PipelineConfig(ner_ray_remote_args={"num_cpus": 2}, ner_concurrency=4))
    assert kw["num_cpus"] == 2


def test_remote_args_excluded_from_resume_fingerprint(mini_run, tmp_path):
    """Changing ner_ray_remote_args (a pure placement knob) must NOT
    invalidate finished partitions on resume."""
    from portuguese_pt_legal_ner_ray.state.manifest import Manifest

    out = tmp_path / "out_fp"
    run_kg_pipeline(mini_run["input"], out, num_partitions=2)
    before = {
        r["partition"]: r["completed_at"]
        for r in Manifest(out).all_records()
        if r["stage"] == "extract"
    }
    run_kg_pipeline(
        mini_run["input"], out,
        cfg=PipelineConfig(ner_ray_remote_args={"num_cpus": 1}),
        num_partitions=2,
    )
    after = {
        r["partition"]: r["completed_at"]
        for r in Manifest(out).all_records()
        if r["stage"] == "extract"
    }
    assert after == before, "placement-only config change recomputed partitions"


def test_gpu_claim_sizes_actor_pool_to_gpu_budget(ray_session, monkeypatch):
    """With ner_ray_remote_args={'num_gpus': g} and no explicit
    ner_concurrency, the NER actor-pool ceiling is cluster_GPUs / g — not
    the CPU count (which would queue unscheduleable actors forever). CPU
    ceiling unchanged when no GPU claim (VERDICT r4 #8)."""
    import ray as _ray

    from portuguese_pt_legal_ner_ray.pipelines.kg import ner_map_batches_kwargs

    real = _ray.cluster_resources()

    def fake_resources():
        return {**real, "CPU": 32.0, "GPU": 4.0}

    monkeypatch.setattr(_ray, "cluster_resources", fake_resources)
    # whole-GPU actors: 4 GPUs / 1 -> ceiling 4
    kw = ner_map_batches_kwargs(
        PipelineConfig(ner_ray_remote_args={"num_gpus": 1}))
    assert kw["concurrency"] == (1, 4) and kw["num_gpus"] == 1
    # fractional claims pack: 4 / 0.25 -> 16 actors sharing the 4 GPUs
    kw = ner_map_batches_kwargs(
        PipelineConfig(ner_ray_remote_args={"num_gpus": 0.25}))
    assert kw["concurrency"] == (1, 16)
    # no GPU claim -> CPU ceiling as before
    kw = ner_map_batches_kwargs(PipelineConfig())
    assert kw["concurrency"] == (1, 32)
    # explicit ner_concurrency always wins
    kw = ner_map_batches_kwargs(
        PipelineConfig(ner_ray_remote_args={"num_gpus": 1}, ner_concurrency=2))
    assert kw["concurrency"] == 2

"""Hard kill-and-resume: SIGKILL the pipeline process mid-extraction, then
resume in a fresh process; output must equal the oracle exactly and
completed partitions must not be recomputed (SURVEY.md §5 test 3, the
strong form of the injected-failure test)."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

RUNNER = """
import sys, ray
sys.path.insert(0, {repo!r})
ray.init(address="local", num_cpus=4, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_pipeline
run_kg_pipeline({inp!r}, {out!r}, num_partitions=4)
ray.shutdown()
"""


def test_sigkill_mid_run_then_resume(tmp_path):
    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.oracle import run_oracle

    inp = tmp_path / "webpages"
    inp.mkdir()
    tables = [gen_pages_shard(s, s * 40, 40) for s in range(4)]
    for s, t in enumerate(tables):
        pq.write_table(t, inp / f"part-{s:05d}.parquet")
    golden = run_oracle(pa.concat_tables(tables))
    out = tmp_path / "out"

    code = RUNNER.format(repo=str(REPO), inp=str(inp), out=str(out))
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    manifest_dir = out / "_manifest"
    deadline = time.time() + 120
    while time.time() < deadline:
        if manifest_dir.exists() and any(manifest_dir.glob("extract__*.json")):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    assert proc.poll() is None, "pipeline finished before we could kill it"
    os.kill(proc.pid, signal.SIGKILL)  # hard kill: no cleanup, no atexit
    proc.wait()

    done_before = {p.name: p.stat().st_mtime for p in manifest_dir.glob("extract__*.json")}
    assert done_before, "no partition completed before the kill"

    subprocess.run([sys.executable, "-c", code], check=True, timeout=300,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    # completed partitions untouched by the resume
    for name, mtime in done_before.items():
        assert (manifest_dir / name).stat().st_mtime == mtime

    got = pads.dataset(out / "graph" / "spans").to_table()
    cols = ["url", "para_idx", "start", "end", "label", "surface"]
    got = got.select(cols).sort_by([(c, "ascending") for c in cols])
    want = golden["spans"].select(cols).sort_by([(c, "ascending") for c in cols])
    assert got.equals(want.cast(got.schema))


def test_resume_invalidates_on_changed_inputs(ray_session, tmp_path):
    """Rerunning against a changed input set / partition count must NOT
    serve stale extract or graph outputs (manifest rows are validated
    against the current plan, not just for existence)."""
    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.oracle import run_oracle
    from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_pipeline

    inp = tmp_path / "webpages"
    inp.mkdir()
    tables = [gen_pages_shard(s, s * 30, 30) for s in range(4)]
    for s, t in enumerate(tables):
        pq.write_table(t, inp / f"part-{s:05d}.parquet")
    out = tmp_path / "out"
    run_kg_pipeline(inp, out, num_partitions=4)

    # change the input set: drop one shard, regenerate a different one
    (inp / "part-00003.parquet").unlink()
    pq.write_table(gen_pages_shard(9, 900, 30), inp / "part-00001.parquet")
    kept = [tables[0], gen_pages_shard(9, 900, 30), tables[2]]
    golden = run_oracle(pa.concat_tables(kept))

    # fewer partitions than before: stale part=0000x dirs must be dropped too
    run_kg_pipeline(inp, out, num_partitions=2)

    got = pads.dataset(out / "graph" / "spans").to_table()
    cols = ["url", "para_idx", "start", "end", "label", "surface"]
    got = got.select(cols).sort_by([(c, "ascending") for c in cols])
    want = golden["spans"].select(cols).sort_by([(c, "ascending") for c in cols])
    assert got.equals(want.cast(got.schema))


def test_orphan_partition_dir_removed(ray_session, tmp_path):
    """A partition dir with NO manifest row (crashed mid-write under a wider
    plan) must still be swept when the plan shrinks below its index."""
    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.pipelines.kg import run_kg_pipeline

    inp = tmp_path / "webpages"
    inp.mkdir()
    for s in range(2):
        pq.write_table(gen_pages_shard(s, s * 20, 20), inp / f"part-{s:05d}.parquet")
    out = tmp_path / "out"
    orphan = out / "extraction" / "part=00007"
    orphan.mkdir(parents=True)
    pq.write_table(gen_pages_shard(9, 0, 5), orphan / "junk.parquet")

    run_kg_pipeline(inp, out, num_partitions=2)
    assert not orphan.exists()

"""Bounded object store: the pipeline must stream (spill + backpressure),
producing identical results with a store far smaller than the data in
flight (SURVEY.md §4 memory-pressure row). Fresh subprocesses because
object_store_memory is fixed at ray.init."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(store_mb: int) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "memory_check.py"), str(store_mb), "0.02"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_small_object_store_matches_large():
    small = _run(90)    # ~minimum Ray allows; well under data in flight
    large = _run(2000)
    for k in ("paragraphs", "nodes", "edges"):
        assert small[k] == large[k] > 0

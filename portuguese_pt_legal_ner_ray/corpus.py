"""Deterministic synthetic web-pages corpus (the BASELINE.json input table).

Schema per ``input_hint``: ``(url: string, warc_ts: timestamp[us],
html: binary, text: string, lang: string)``. Content follows FIXTURES.md F1/F5
— Portuguese legal sentence templates instantiated from the config gazetteers,
seed-fixed (numpy ``default_rng([42, shard])`` per shard so any shard can be
regenerated independently), HTML rendered so extraction is byte-exact
(functions/html.py). ~4/7 of pages are ``lang == "pt"``; non-pt pages carry
entity-free filler and exercise the lineage-preserving language gate.

A deliberate skew knob makes "Ministério Público" the hot entity (~50% of
ORG draws in one template), per SURVEY.md §5 skew test.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import FIRST_NAMES, LAST_NAMES, LOCS, ORGS, PT_MONTHS
from .functions.html import render_html
from .functions.normalize import normalize_surface

# bump to invalidate cached corpora + goldens under /tmp
CORPUS_VERSION = "v5"

# Finite value pools: real web corpora have heavy-tailed entity
# distributions (the same dates, process numbers and contacts recur across
# pages), so regex-entity surfaces draw from fixed pools instead of the full
# numeric range. Pool sizes set distinct-entity cardinality ~16k.
def _build_pools() -> dict[str, list[str]]:
    rng = np.random.default_rng([42, 7777])
    dates_slash, dates_long, idps, ceps, tels, mats = [], [], [], [], [], []
    for _ in range(1500):
        d, m, y = int(rng.integers(1, 29)), int(rng.integers(1, 13)), int(rng.integers(2015, 2025))
        dates_slash.append(f"{d:02d}/{m:02d}/{y}")
        dates_long.append(f"{d} de {PT_MONTHS[m - 1]} de {y}")
    for _ in range(5000):
        idps.append(f"{int(rng.integers(100, 999999))}/{int(rng.integers(2015, 2025))}")
        tels.append(f"9{int(rng.integers(10000000, 99999999))}")
    for _ in range(2000):
        ceps.append(f"{int(rng.integers(1000, 9999))}-{int(rng.integers(100, 999)):03d}")
        mats.append(
            chr(65 + int(rng.integers(0, 26))) + chr(65 + int(rng.integers(0, 26)))
            + f"-{int(rng.integers(10, 99))}-"
            + chr(65 + int(rng.integers(0, 26))) + chr(65 + int(rng.integers(0, 26)))
        )
    return {"dates_slash": dates_slash, "dates_long": dates_long, "idps": idps,
            "ceps": ceps, "tels": tels, "mats": mats}


_POOLS = _build_pools()

LANG_CYCLE = ["pt", "pt", "pt", "en", "es", "de", "fr"]
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_FILLER_NON_PT = [
    "The court convened and issued a ruling on the pending matter.",
    "Further proceedings are scheduled for the next judicial term.",
    "El documento fue archivado sin efectos adicionales.",
    "Das Verfahren wurde ohne weitere Anordnung eingestellt.",
    "La procédure a été close sans autre mesure.",
]
_FILLER_PT = [
    "Nos termos do artigo anterior, o presente documento produz efeitos imediatos.",
    "O presente acórdão transitou em julgado nos termos legais.",
    "   O tribunal reuniu em sessão plenária.   ",  # strip() edge case
]


def _email(first: str, last: str) -> str:
    return f"{normalize_surface(first)}.{normalize_surface(last)}@exemplo.pt"


def _pt_paragraph(rng: np.random.Generator) -> str:
    """One Portuguese paragraph from the F5 template pool."""
    t = int(rng.integers(0, 9))
    first = FIRST_NAMES[int(rng.integers(0, len(FIRST_NAMES)))]
    last = LAST_NAMES[int(rng.integers(0, len(LAST_NAMES)))]
    per = f"{first} {last}"
    # hot-entity skew: half of the ORG draws in templates 4/5 are the hot org
    if t in (4, 5) and rng.random() < 0.5:
        org = "Ministério Público" if rng.random() < 0.7 else "Ministerio Publico"
    else:
        org = ORGS[int(rng.integers(0, len(ORGS)))]
    loc = LOCS[int(rng.integers(0, len(LOCS)))]
    di = int(rng.integers(0, len(_POOLS["dates_slash"])))
    dat_slash = _POOLS["dates_slash"][di]
    dat_long = _POOLS["dates_long"][int(rng.integers(0, len(_POOLS["dates_long"])))]
    idp = _POOLS["idps"][int(rng.integers(0, len(_POOLS["idps"])))]
    cep = _POOLS["ceps"][int(rng.integers(0, len(_POOLS["ceps"])))]
    mat = _POOLS["mats"][int(rng.integers(0, len(_POOLS["mats"])))]
    tel = _POOLS["tels"][int(rng.integers(0, len(_POOLS["tels"])))]
    if t == 0:
        return f"O processo número {idp} do réu {per} foi julgado em {dat_slash}."
    if t == 1:
        return (f"{per}, residente na Rua das Flores, {cep} {loc}, "
                f"contactável através do email {_email(first, last)}.")
    if t == 2:
        return f"O {org} decidiu sobre o caso com matrícula {mat} em {dat_long}."
    if t == 3:
        return f"A empresa {org} está sediada no {loc} e foi fundada em {dat_long}."
    if t == 4:
        return f"{per} trabalha para o {org} desde {dat_long}."
    if t == 5:
        return f"O {org} notificou {per} em {dat_slash} através do contacto {tel}."
    if t == 6:
        return f"O réu {per} foi notificado em {loc}, em {dat_slash}."
    if t == 7:
        # standalone surname -> weak low-confidence PER (threshold exercise)
        return f"O recurso apresentado por {last} foi indeferido."
    return _FILLER_PT[int(rng.integers(0, len(_FILLER_PT)))]


def gen_pages_shard(shard: int, start_idx: int, n: int) -> pa.Table:
    """Deterministic shard of the web-pages table (pure function of args)."""
    rng = np.random.default_rng([42, shard])
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for k in range(n):
        i = start_idx + k
        lang = LANG_CYCLE[i % len(LANG_CYCLE)]
        n_paras = 1 + int(rng.integers(0, 8))
        lines: list[str] = []
        for _ in range(n_paras):
            if lang == "pt":
                lines.append(_pt_paragraph(rng))
            else:
                lines.append(_FILLER_NON_PT[int(rng.integers(0, len(_FILLER_NON_PT)))])
            if rng.random() < 0.15:
                lines.append("   " if rng.random() < 0.5 else "")  # dropped by splitter
        text = "\n".join(lines)
        urls.append(f"https://ex{i % 97}.pt/doc/{i}")
        tss.append(EPOCH_US + i * 3_600_000_000)
        htmls.append(render_html(text))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_for_sf(sf: float) -> int:
    return max(100, round(sf * 500_000))


def shard_plan(n_pages: int, target_shard_rows: int | None = None) -> list[tuple[int, int, int]]:
    """[(shard, start_idx, n_rows)] — at least 8 shards for resume tests.

    Shard size is a pure function of n_pages (corpus content depends on the
    plan, so the plan must be deterministic per scale): 1024 rows for small
    corpora, 4096 for bench-scale ones (fewer files -> less scheduling
    overhead per read task).
    """
    if target_shard_rows is None:
        target_shard_rows = 1024 if n_pages <= 500_000 else 4096
    n_shards = max(8, -(-n_pages // target_shard_rows))
    base = n_pages // n_shards
    rem = n_pages % n_shards
    plan, start = [], 0
    for s in range(n_shards):
        rows = base + (1 if s < rem else 0)
        plan.append((s, start, rows))
        start += rows
    return plan


def corpus_dir(sf: float, root: str = "/tmp/kgray_corpus") -> Path:
    return Path(root) / CORPUS_VERSION / f"sf{sf:g}"


def atomic_publish(tmp: Path, final: Path) -> None:
    """Promote a fully-written staging dir (must already hold ``_DONE``) to
    ``final`` via one atomic rename.

    Concurrency/crash contract: if a concurrent publisher won the rename
    race (``final/_DONE`` exists), our staging copy is discarded — outputs
    are deterministic, so both copies are identical. A ``final`` WITHOUT
    the marker is a crashed run's debris: it is removed and the rename
    retried. Any other failure raises — a partial cache is never silently
    served.

    EVERY publish path holds an exclusive ``flock`` on a sibling lock file,
    so the check-marker / delete-debris / rename sequence is atomic against
    other publishers: a lock-free fast path would re-open the race when the
    debris is an EMPTY dir (``os.replace`` onto an empty dir succeeds), in
    which a concurrent winner publishes a valid dir between our ``_DONE``
    check and ``rmtree(final)`` — and readers that already saw the marker
    would observe the published dir disappearing mid-read. Readers never
    take the lock: a dir carrying ``_DONE`` is never deleted (the only
    ``rmtree(final)`` happens under the lock after confirming the marker is
    absent, and markers only appear under the same lock).
    """
    import fcntl
    import shutil

    lock_path = final.parent / f".{final.name}.publish.lock"
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if (final / "_DONE").exists():  # a winner already published
                shutil.rmtree(tmp, ignore_errors=True)
                return
            shutil.rmtree(final, ignore_errors=True)  # crashed-run debris
            try:
                os.replace(tmp, final)
            except OSError as exc:
                raise RuntimeError(f"could not publish cache dir {final}") from exc
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def ensure_webpages(sf: float, root: str = "/tmp/kgray_corpus") -> Path:
    """Write (once) the sharded web-pages parquet for a scale factor.

    Returns the directory holding ``webpages/part-*.parquet``. Idempotent and
    concurrency-safe: each process stages into its own unique tmp dir (so a
    racing writer can never tear another's files) and publishes with one
    atomic rename guarded by the ``_DONE`` marker.
    """
    import tempfile

    d = corpus_dir(sf, root)
    done = d / "webpages" / "_DONE"
    if done.exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(dir=d, prefix="webpages.tmp."))
    plan = shard_plan(pages_for_sf(sf))

    def _write(shard: int, start: int, n: int) -> None:
        pq.write_table(gen_pages_shard(shard, start, n), tmp / f"part-{shard:05d}.parquet")

    # shard generation is embarrassingly parallel and deterministic per shard;
    # fan out over Ray when a session is up (large bench corpora), else inline
    try:
        import ray

        use_ray = ray.is_initialized() and len(plan) >= 16
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _gen(shard: int, start: int, n: int) -> None:
            _write(shard, start, n)

        ray.get([_gen.remote(*p) for p in plan])
    else:
        for p in plan:
            _write(*p)
    (tmp / "_DONE").write_text(CORPUS_VERSION)
    atomic_publish(tmp, d / "webpages")
    return d

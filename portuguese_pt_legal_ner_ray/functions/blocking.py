"""Candidate-pair generation within an LSH block (shared, order-free).

The pairing is a *pure function of the block's member set* so the Ray
pipeline and the single-process oracle produce identical candidate edges at
any parallelism (SURVEY.md §4 determinism; §7 "salt only the pairing, never
the component id"):

* members are the distinct normalized surfaces that share a band key;
* small blocks: sorted-neighborhood pairing (each member paired with its
  next ``window`` neighbors in sorted order);
* hot blocks (> ``salt_threshold`` members): members are salted into
  ``salt_buckets`` groups by a stable hash, sorted-neighborhood pairing runs
  inside each salt group, and the lexicographic minima of the groups are
  chained pairwise so the block stays connectable; total pairs capped at
  ``max_block_pairs``.
"""

from __future__ import annotations

import hashlib

from ..config import LinkingConfig

SALT_THRESHOLD = 64


def _salt(member: str, buckets: int) -> int:
    return int.from_bytes(hashlib.md5(member.encode()).digest()[:4], "big") % buckets


def _neighborhood(sorted_members: list[str], window: int) -> list[tuple[str, str]]:
    pairs = []
    n = len(sorted_members)
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            pairs.append((sorted_members[i], sorted_members[j]))
    return pairs


def pairs_for_block(members: set[str] | list[str],
                    cfg: LinkingConfig = LinkingConfig()) -> list[tuple[str, str]]:
    """Deterministic candidate pairs (a < b) for one block's member set."""
    ms = sorted(set(members))
    if len(ms) < 2:
        return []
    if len(ms) <= SALT_THRESHOLD:
        pairs = _neighborhood(ms, cfg.window)
    else:
        groups: dict[int, list[str]] = {}
        for m in ms:
            groups.setdefault(_salt(m, cfg.salt_buckets), []).append(m)
        pairs = []
        reps = []
        for _, g in sorted(groups.items()):
            pairs.extend(_neighborhood(g, cfg.window))
            reps.append(g[0])  # groups hold sorted members (ms was sorted)
        reps.sort()
        pairs.extend(zip(reps, reps[1:]))
    return pairs[: cfg.max_block_pairs]

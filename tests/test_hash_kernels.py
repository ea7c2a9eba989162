"""Property tests for the vectorized hash kernels (hypothesis).

These kernels back every grouped_* shuffle bucket, the LSH band keys and
simhash — a silent mismatch vs their scalar definitions would mis-route
keys without failing any aggregate, so they get exhaustive randomized
parity checks against independent references.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from portuguese_pt_legal_ner_ray.functions.minhash import _gram_hashes, shingles
from portuguese_pt_legal_ner_ray.stages.shuffle import hash_strings
from portuguese_pt_legal_ner_ray.stages.textops import simhash64, simhash_batch

_M = 1 << 64


def _fmix(x: int) -> int:
    for mul in (0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53):
        x ^= x >> 33
        x = (x * mul) % _M
    x ^= x >> 33
    return x


def _ref_hash(s: str) -> int:
    b = s.encode()
    x = 0
    for i, c in enumerate(b):
        x = (x + c * pow(1099511628211, i, _M)) % _M
    return _fmix(x)


texts = st.lists(st.text(max_size=80), min_size=0, max_size=20)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_hash_strings_matches_scalar_reference(vals):
    arr = pa.array(vals, pa.string())
    got = hash_strings(arr)
    assert [int(h) for h in got] == [_ref_hash(v) for v in vals]


@settings(max_examples=60, deadline=None)
@given(texts)
def test_hash_strings_large_string_and_slices(vals):
    arr = pa.array(vals, pa.large_string())
    got = hash_strings(arr)
    assert [int(h) for h in got] == [_ref_hash(v) for v in vals]
    small = pa.array(vals, pa.string())
    lo = min(1, len(vals))
    sliced = small.slice(lo, max(len(vals) - lo, 0))
    assert [int(h) for h in hash_strings(sliced)] == [_ref_hash(v) for v in vals[lo:]]


def _ref_gram_hash(text: str, k: int) -> list[int]:
    cps = [ord(c) for c in text]
    grams = [cps] if 0 < len(cps) < k else [cps[i:i + k] for i in range(len(cps) - k + 1)]
    out = []
    for g in grams:
        x = 0
        for i, c in enumerate(g):
            x = (x + c * pow(1099511628211, i, _M)) % _M
        out.append(_fmix(x) & 0xFFFFFFFF)
    return out


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=60), st.integers(min_value=1, max_value=6))
def test_gram_hashes_match_scalar_reference(text, k):
    got = _gram_hashes(text, k).tolist()
    assert got == _ref_gram_hash(text, k)
    assert shingles(text, k) == set(_ref_gram_hash(text, k))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=10))
def test_simhash_batch_matches_scalar(vals):
    import pyarrow.compute as pc

    t = pa.table({
        "doc_id": pa.array(range(len(vals)), pa.int64()),
        "text": pa.array(vals, pa.string()),
    })
    import re as _re

    got = simhash_batch(t)["simhash"].to_pylist()
    # scalar reference: Arrow lower (Python str.lower differs from utf8proc
    # on a few codepoints, e.g. 'İ') + an independent ASCII-whitespace split
    want = []
    for v in vals:
        low = pc.utf8_lower(pa.array([v]))[0].as_py()
        want.append(simhash64([x for x in _re.split(r"[ \t\n\r\x0b\x0c]+", low) if x]))
    assert got == want


def test_hash_strings_non_dense_buffer():
    """Arrow split kernels return zero-copy slices into the ORIGINAL buffer
    (separator bytes remain as gaps between strings) — hashing such an
    array must equal hashing a densely re-materialized copy. Regression:
    the dense-layout assumption read gap bytes into neighboring hashes."""
    import pyarrow.compute as pc

    src = pa.array(["a b  c", "xx  yy ", " z", "", "q"])
    flat = pc.list_flatten(pc.ascii_split_whitespace(src))
    dense = pa.array(flat.to_pylist(), pa.string())  # fresh, densely packed
    assert hash_strings(flat).tolist() == hash_strings(dense).tolist()


def test_hash_strings_no_trivial_collisions():
    vals = [f"k{i}" for i in range(20000)]
    h = hash_strings(pa.array(vals, pa.string()))
    assert len(np.unique(h)) == len(vals)


def test_mirror_hash_spec_matches_vectorized_kernel():
    """oracle_mirrors._hash_str is the sequential spec of
    stages/shuffle.hash_strings — byte-for-byte equal, so the mirror
    goldens (simhash/MLM) check the distributed kernels against an
    independent restatement, not against themselves."""
    import numpy as np
    import pyarrow as pa

    from portuguese_pt_legal_ner_ray.oracle_mirrors import _hash_str
    from portuguese_pt_legal_ner_ray.stages.shuffle import hash_strings

    samples = ["", "a", "abc", "hello world", "Олимпиада", "naïve café",
               "x" * 300, "tab\tsep", "ação é über 東京", "0", " "]
    got = hash_strings(pa.array(samples, pa.string()))
    want = np.array([_hash_str(s) for s in samples], dtype=np.uint64)
    assert (got == want).all()

"""Ray-Data-native knowledge-graph construction engine.

Semantics lifted from the reference ``EduardoPamplona/portuguese-PT_legal_NER``
(/root/reference): paragraph splitting (src/inference.py:171-183), BIO span
decoding with "simple" aggregation and confidence/validity filters
(src/inference.py:185-216), entity label set (src/data.py:27-47) — rebuilt
from scratch on ray.data.Dataset / map_batches over zero-copy Arrow, with
triple extraction, minhash blocking, connected-components canonicalization
and Parquet graph materialization on top (per BASELINE.json north_star).
"""

__version__ = "0.1.0"

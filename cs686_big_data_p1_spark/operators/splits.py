"""Shared train/val/test split constants.

dataset_split (pipeline.py), the n-gram decontaminate (pipeline.py),
and the embedding-space decontaminate_semantic (ann.py) must all agree
on what "train" and "test" mean, and pipeline/ann cannot import each
other at module scope (both build oracle strings at import time). The
ONE copy of the split boundary lives here, import-cycle-free.

Deterministic 3-way split: the first two hex chars of a keyed md5
carve [00, e6) / [e6, f3) / [f3, ff] ~ 90/5/5 — membership is a pure
function of doc_id, stable across runs, engines, and re-shards.
"""

SPLIT_BOUNDS = ("e6", "f3")

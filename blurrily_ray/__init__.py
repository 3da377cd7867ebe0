"""blurrily_ray — a Ray-Data-native record-linkage / fuzzy-matching engine.

From-scratch rebuild of the capabilities of mezis/blurrily (trigram fuzzy
string index; see /root/reference) re-expressed as Ray Data pipelines:

- ``functions/``  pure + vectorized kernels (normalize, trigram codec, hashing,
  text statistics) with no Ray dependency — unit-testable in isolation.
- ``sources/``    dataset readers and the deterministic transcript synthesizer.
- ``stages/``     map_batches / groupby building blocks (tokenize-explode,
  postings index, candidate pairs, clustering, dedup, similarity search).
- ``pipelines/``  end-to-end wiring (find-compat parity mode, entity
  resolution over transcripts).
- ``state/``      checkpoint manifests, resume, metrics.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"

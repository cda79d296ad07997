"""jsonschema_ray — a Ray-Data-native schema + constraint validation engine.

Reimplements the Draft-4 keyword semantics of tdakkota/jsonschema (reference
at /root/reference, cited per-module as file:line) as:

* :mod:`jsonschema_ray.core` — exact, lexeme-preserving row-level validator
  (the slow path; also the compile/$ref machinery, all driver-side);
* :mod:`jsonschema_ray.vector` — compiled vectorized constraint plans
  (pyarrow.compute kernels) for flat Arrow columns;
* :mod:`jsonschema_ray.stages` — Ray Data stages: validator actor pools,
  mergeable stats sketches, uniqueness/referential/drift checks, dedup,
  similarity search, text analysis;
* :mod:`jsonschema_ray.sources` — deterministic synthetic transcript tables
  and the conformance corpus as Parquet;
* :mod:`jsonschema_ray.pipelines` — end-to-end validation pipeline with
  per-partition manifests and resume.
"""

__version__ = "0.1.0"

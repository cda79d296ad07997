"""Incremental (cross-run) dedup against a shared mutable index.

Batch dedup (stages/dedup.py) answers "which rows duplicate each other
WITHIN this dataset".  Ingest pipelines also need "which rows duplicate
anything we have EVER accepted" — state that must mutate across batches
and survive across pipeline runs.  That is the one semantic the Dataset
API cannot express, so this is the engine's documented last resort: raw
``@ray.remote`` actors (SURVEY.md §2 custom-operator rule (c)).

Design for 100 TB:

* the index is SHARDED — ``n_shards`` actors each own ``hash % n_shards``
  of the key space, so memory and call load spread, and shard count
  scales with nodes;
* batches route each content hash to its shard and issue the shard calls
  concurrently (one round trip per shard per batch, not per row);
* an actor serializes its calls, so two racing batches inserting the same
  key get exactly one "new" verdict between them — first-writer-wins with
  no lost updates;
* only 8-byte hashes travel (as numpy arrays — Ray ships them zero-copy)
  and live in the index, never text;
* shard storage is a SORTED uint64 array (8 B/key) plus a small sorted
  pending run that merges in amortized O(1) per key — no Python ``set``
  (whose ~60 B/key boxed ints were the round-4 memory finding);
* the index is DURABLE: :meth:`checkpoint` snapshots every shard to a
  directory (one ``.npy`` per shard + an atomic ``MANIFEST.json`` via
  the state/manifest layer), and ``StreamingDeduper(checkpoint_dir=...)``
  restores it, so a restarted ingest run resumes with everything the
  previous runs accepted (tests/test_round4.py simulates the restart).
  A production deployment checkpoints after each ingest run or on a row
  cadence; the snapshot is consistent because a checkpoint is only taken
  between ``dedup`` executions (actors are idle) and the manifest is
  written only after every shard file is on disk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["StreamingDeduper"]

_MERGE_THRESHOLD = 1 << 19  # pending keys per shard before re-merge


class _ShardState:
    """Sorted-array key set with an amortized pending run (plain object —
    wrapped in a Ray actor below, but unit-testable without Ray)."""

    def __init__(self, keys: np.ndarray | None = None) -> None:
        self.sorted = (
            np.sort(keys.astype(np.uint64)) if keys is not None and len(keys) else np.empty(0, np.uint64)
        )
        self.pending = np.empty(0, np.uint64)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """→ bool[n]: True iff the key was unseen until now (marks seen).
        ``keys`` are unique within the call (caller dedupes per batch)."""
        keys = keys.astype(np.uint64, copy=False)
        idx = np.searchsorted(self.sorted, keys)
        idx_c = np.minimum(idx, max(len(self.sorted) - 1, 0))
        in_sorted = (
            (self.sorted[idx_c] == keys) & (idx < len(self.sorted))
            if len(self.sorted)
            else np.zeros(len(keys), dtype=bool)
        )
        pidx = np.searchsorted(self.pending, keys)
        pidx_c = np.minimum(pidx, max(len(self.pending) - 1, 0))
        in_pending = (
            (self.pending[pidx_c] == keys) & (pidx < len(self.pending))
            if len(self.pending)
            else np.zeros(len(keys), dtype=bool)
        )
        new = ~(in_sorted | in_pending)
        if new.any():
            self.pending = np.union1d(self.pending, keys[new])
            if len(self.pending) >= _MERGE_THRESHOLD:
                self.sorted = np.union1d(self.sorted, self.pending)
                self.pending = np.empty(0, np.uint64)
        return new

    def snapshot(self) -> np.ndarray:
        return np.union1d(self.sorted, self.pending)

    def size(self) -> int:
        return len(self.sorted) + len(self.pending)


class StreamingDeduper:
    """Sharded seen-content index + the map_batches filter that uses it."""

    def __init__(self, n_shards: int = 8, checkpoint_dir: str | None = None) -> None:
        import ray

        @ray.remote(num_cpus=0.1)
        class _Shard:
            def __init__(self, init_keys: np.ndarray | None = None) -> None:
                self.state = _ShardState(init_keys)

            def check_and_add(self, keys: np.ndarray) -> np.ndarray:
                return self.state.check_and_add(keys)

            def snapshot(self) -> np.ndarray:
                return self.state.snapshot()

            def size(self) -> int:
                return self.state.size()

        init: list[np.ndarray | None] = [None] * n_shards
        if checkpoint_dir is not None and os.path.exists(
            os.path.join(checkpoint_dir, "MANIFEST.json")
        ):
            import json

            with open(os.path.join(checkpoint_dir, "MANIFEST.json")) as f:
                man = json.load(f)
            if man["n_shards"] != n_shards:
                raise ValueError(
                    f"checkpoint has {man['n_shards']} shards, requested {n_shards}"
                )
            init = [
                np.load(os.path.join(checkpoint_dir, f"shard-{s:04d}.npy"))
                for s in range(n_shards)
            ]
        self.n_shards = n_shards
        self.shards = [_Shard.remote(init[s]) for s in range(n_shards)]

    def index_size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def checkpoint(self, out_dir: str) -> dict:
        """Snapshot every shard's key set to ``out_dir`` (atomic: files
        first, manifest last).  → the manifest dict."""
        import ray

        from ..state.manifest import ENGINE_VERSION, atomic_json

        os.makedirs(out_dir, exist_ok=True)
        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        for s, arr in enumerate(snaps):
            tmp = os.path.join(out_dir, f"shard-{s:04d}.npy.tmp")
            final = os.path.join(out_dir, f"shard-{s:04d}.npy")
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, final)
        man = {
            "engine_version": ENGINE_VERSION,
            "n_shards": self.n_shards,
            "n_keys": int(sum(len(a) for a in snaps)),
            "per_shard": [int(len(a)) for a in snaps],
        }
        atomic_json(os.path.join(out_dir, "MANIFEST.json"), man)
        return man

    def dedup(self, ds, text_col: str = "text", id_col: str = "doc_id"):
        """→ Dataset of rows whose content was never seen before (here or
        in any earlier ``dedup`` call on this index)."""
        import ray

        shards, n_shards = self.shards, self.n_shards

        def keep_new(t: pa.Table) -> pa.Table:
            from .tokhash import hash_strings

            h = hash_strings(t[text_col])
            # within-batch first occurrence wins before the index sees it
            _u, first_idx = np.unique(h, return_index=True)
            first = np.zeros(len(h), dtype=bool)
            first[first_idx] = True
            keep = first.copy()
            sid = (h % np.uint64(n_shards)).astype(np.int64)
            futures, routed = [], []
            for s in range(n_shards):
                rows = np.flatnonzero(first & (sid == s))
                if len(rows):
                    routed.append(rows)
                    futures.append(shards[s].check_and_add.remote(h[rows]))
            for rows, verdicts in zip(routed, ray.get(futures)):
                keep[rows] = verdicts
            return t.filter(pa.array(keep))

        return ds.map_batches(keep_new, batch_format="pyarrow", zero_copy_batch=True)

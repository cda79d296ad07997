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
* shard storage is a SORTED base array (8 B/key) plus a bounded list of
  sorted pending RUNS: an insert batch appends one run (sorting only its
  own keys), membership probes binary-search the base and each run, and
  runs consolidate only at thresholds — amortized O(log) per key, never
  an O(P) re-sort of all pending per batch (round-4 advice finding);
* with ``spill_dir`` set the base array is DISK-BACKED (``np.memmap``):
  run consolidation streams a chunked two-way merge into a new ``.npy``
  and re-maps it, so a shard's heap holds only its pending runs — at
  10¹¹ keys the 800 GB of sorted base lives on disk/page cache, not in
  actor heaps (round-4 verdict item 5);
* the index is DURABLE: :meth:`checkpoint` snapshots every shard to a
  directory (one ``.npy`` per shard + an atomic ``MANIFEST.json`` via
  the state/manifest layer) — each SHARD writes its own file, the driver
  only collects counts — and ``StreamingDeduper(checkpoint_dir=...)``
  restores it (memory-mapped when ``spill_dir`` is set), so a restarted
  ingest run resumes with everything the previous runs accepted
  (tests/test_round4.py simulates the restart).  A production deployment
  checkpoints after each ingest run or on a row cadence; the snapshot is
  consistent because a checkpoint is only taken between ``dedup``
  executions (actors are idle) and the manifest is written only after
  every shard file is on disk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["StreamingDeduper"]

_MERGE_THRESHOLD = 1 << 19  # pending keys per shard before base re-merge
_MAX_RUNS = 16  # pending runs per shard before the runs consolidate
_MERGE_CHUNK = 4 << 20  # keys copied per step of the chunked disk merge


def _npy_memmap(path: str):
    return np.load(path, mmap_mode="r")


def _merge_to_npy(path: str, base: np.ndarray, pend: np.ndarray) -> np.ndarray:
    """Two-way merge of sorted, disjoint ``base`` (possibly a memmap) and
    ``pend`` into a fresh ``.npy`` at ``path``, streamed in
    ``_MERGE_CHUNK``-key chunks — peak heap is O(chunk + len(pend)),
    independent of ``len(base)``.  → the merged array, memory-mapped."""
    n = len(base) + len(pend)
    tmp = f"{path}.tmp-{os.getpid()}"
    out = np.lib.format.open_memmap(tmp, mode="w+", dtype=np.uint64, shape=(n,))
    if len(pend):
        # each pending key lands after every smaller base key plus the
        # pending keys before it; keys are disjoint so side is irrelevant
        ins = np.searchsorted(base, pend)
        out[ins + np.arange(len(pend), dtype=np.int64)] = pend
    for s in range(0, len(base), _MERGE_CHUNK):
        chunk = np.asarray(base[s : s + _MERGE_CHUNK])
        shift = np.searchsorted(pend, chunk, side="right")
        out[np.arange(s, s + len(chunk), dtype=np.int64) + shift] = chunk
    out.flush()
    del out
    os.replace(tmp, path)
    return _npy_memmap(path)


class _ShardState:
    """Sorted base + run-list pending key set (plain object — wrapped in a
    Ray actor below, but unit-testable without Ray).

    ``spill_dir=None`` keeps the base in heap (merges via one
    ``np.sort`` of the concatenation); with a directory, the base is a
    ``np.memmap`` and merges stream to disk."""

    def __init__(
        self, keys: np.ndarray | None = None, spill_dir: str | None = None
    ) -> None:
        self.spill_dir = spill_dir
        self._gen = 0
        if spill_dir is not None:
            os.makedirs(spill_dir, exist_ok=True)
        if keys is not None and len(keys):
            if isinstance(keys, np.memmap):
                self.base = keys  # restored checkpoint, already sorted
            else:
                self.base = np.sort(np.asarray(keys, dtype=np.uint64))
        else:
            self.base = np.empty(0, np.uint64)
        self.runs: list[np.ndarray] = []
        self.pending_n = 0

    def _probe(self, arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
        if not len(arr):
            return np.zeros(len(keys), dtype=bool)
        idx = np.searchsorted(arr, keys)
        idx_c = np.minimum(idx, len(arr) - 1)
        return (np.asarray(arr[idx_c]) == keys) & (idx < len(arr))

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """→ bool[n]: True iff the key was unseen until now (marks seen).
        ``keys`` are unique within the call (caller dedupes per batch)."""
        keys = keys.astype(np.uint64, copy=False)
        seen = self._probe(self.base, keys)
        for run in self.runs:
            seen |= self._probe(run, keys)
        new = ~seen
        if new.any():
            self.runs.append(np.sort(keys[new]))
            self.pending_n += int(new.sum())
            if self.pending_n >= _MERGE_THRESHOLD:
                self._merge_base()
            elif len(self.runs) > _MAX_RUNS:
                # consolidate runs only — keeps probes O(log) without
                # touching the (possibly huge, disk-backed) base
                self.runs = [np.sort(np.concatenate(self.runs))]
        return new

    def _pending_sorted(self) -> np.ndarray:
        if not self.runs:
            return np.empty(0, np.uint64)
        return np.sort(np.concatenate(self.runs))

    def _merge_base(self) -> None:
        pend = self._pending_sorted()
        if self.spill_dir is None:
            self.base = np.sort(np.concatenate([np.asarray(self.base), pend]))
        else:
            self._gen += 1
            path = os.path.join(self.spill_dir, f"base-{self._gen:06d}.npy")
            old = self.base.filename if isinstance(self.base, np.memmap) else None
            self.base = _merge_to_npy(path, self.base, pend)
            # reclaim superseded spill generations — never files we only
            # mapped but don't own (e.g. a restored checkpoint's .npy)
            if (
                old
                and os.path.exists(old)
                and os.path.dirname(os.path.abspath(old))
                == os.path.abspath(self.spill_dir)
                and os.path.abspath(old) != os.path.abspath(path)
            ):
                os.unlink(old)
        self.runs = []
        self.pending_n = 0

    def save(self, path: str) -> int:
        """Write the full sorted key set to ``path`` as ``.npy`` (chunked
        when disk-backed — driver never holds the keys).  → key count."""
        pend = self._pending_sorted()
        if self.spill_dir is None:
            arr = np.sort(np.concatenate([np.asarray(self.base), pend]))
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, path)
            return len(arr)
        merged = _merge_to_npy(path, self.base, pend)
        return len(merged)

    def snapshot(self) -> np.ndarray:
        return np.sort(np.concatenate([np.asarray(self.base), self._pending_sorted()]))

    def size(self) -> int:
        return len(self.base) + self.pending_n


class StreamingDeduper:
    """Sharded seen-content index + the map_batches filter that uses it."""

    def __init__(
        self,
        n_shards: int = 8,
        checkpoint_dir: str | None = None,
        spill_dir: str | None = None,
    ) -> None:
        import ray

        @ray.remote(num_cpus=0.1)
        class _Shard:
            def __init__(
                self,
                init_path: str | None = None,
                spill_dir: str | None = None,
            ) -> None:
                init = None
                if init_path is not None:
                    # memory-map restored checkpoints when disk-backed:
                    # restore touches no heap, probes fault pages lazily
                    init = (
                        _npy_memmap(init_path)
                        if spill_dir is not None
                        else np.load(init_path)
                    )
                self.state = _ShardState(init, spill_dir=spill_dir)

            def check_and_add(self, keys: np.ndarray) -> np.ndarray:
                return self.state.check_and_add(keys)

            def save(self, path: str) -> int:
                return self.state.save(path)

            def snapshot(self) -> np.ndarray:
                return self.state.snapshot()

            def size(self) -> int:
                return self.state.size()

        init_paths: list[str | None] = [None] * n_shards
        man = None
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
            init_paths = [
                os.path.join(checkpoint_dir, f"shard-{s:04d}.npy")
                for s in range(n_shards)
            ]
        self.n_shards = n_shards
        self.shards = [
            _Shard.remote(
                init_paths[s],
                spill_dir=None if spill_dir is None else os.path.join(spill_dir, f"shard-{s:04d}"),
            )
            for s in range(n_shards)
        ]
        if man is not None and man.get("per_shard"):
            # restore integrity: the shard file an actor loaded (from ITS
            # node's view of checkpoint_dir) must hold exactly the key
            # count the manifest recorded — catches a non-shared
            # checkpoint dir or a stale same-named file immediately
            # instead of silently readmitting duplicates
            got = ray.get([s.size.remote() for s in self.shards])
            if [int(g) for g in got] != [int(c) for c in man["per_shard"]]:
                raise RuntimeError(
                    f"checkpoint restore mismatch: manifest per-shard counts "
                    f"{man['per_shard']} != restored {got} — is "
                    f"{checkpoint_dir!r} on a filesystem all nodes share?"
                )

    def index_size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def checkpoint(self, out_dir: str, shared_fs: bool | None = None) -> dict:
        """Snapshot every shard's key set to ``out_dir`` (atomic: files
        first, manifest last).  → the manifest dict.

        ``shared_fs=True``: each shard ACTOR writes its own file — the
        keys never pass through the driver, but ``out_dir`` must be a
        filesystem every node (and the restoring driver) sees, or restore
        on a different node raises / finds stale bytes.  ``shared_fs=
        False``: shard snapshots are shipped to the driver one at a time
        and written there — placement-independent, driver heap bounded by
        ONE shard (8 B/key).  Default (None): actor-side on a single-node
        cluster (where local disk IS shared), driver-side otherwise.
        Restore cross-checks per-shard key counts against the manifest
        either way, so a stale same-named file can never restore
        silently."""
        import ray

        from ..state.manifest import ENGINE_VERSION, atomic_json

        os.makedirs(out_dir, exist_ok=True)
        if shared_fs is None:
            shared_fs = len([n for n in ray.nodes() if n.get("Alive")]) <= 1
        if shared_fs:
            counts = ray.get(
                [
                    s.save.remote(os.path.join(out_dir, f"shard-{i:04d}.npy"))
                    for i, s in enumerate(self.shards)
                ]
            )
        else:
            counts = []
            for i, s in enumerate(self.shards):
                arr = ray.get(s.snapshot.remote())
                # name must END in .npy or np.save appends another suffix
                tmp = os.path.join(out_dir, f".tmp-shard-{i:04d}.npy")
                np.save(tmp, arr)
                os.replace(tmp, os.path.join(out_dir, f"shard-{i:04d}.npy"))
                counts.append(len(arr))
                del arr
        man = {
            "engine_version": ENGINE_VERSION,
            "n_shards": self.n_shards,
            "n_keys": int(sum(counts)),
            "per_shard": [int(c) for c in counts],
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

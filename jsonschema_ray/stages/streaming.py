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
* only 8-byte hashes travel and live in the index, never text.

Restart durability is out of scope here (a production index would
checkpoint shard sets to object storage via the manifest layer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["StreamingDeduper"]


class StreamingDeduper:
    """Sharded seen-content index + the map_batches filter that uses it."""

    def __init__(self, n_shards: int = 8) -> None:
        import ray

        @ray.remote(num_cpus=0.1)
        class _Shard:
            def __init__(self) -> None:
                self.seen: set[int] = set()

            def check_and_add(self, keys: list[int]) -> list[bool]:
                """→ per-key True iff unseen until now (and marks it seen)."""
                seen = self.seen
                out = [k not in seen for k in keys]
                seen.update(keys)
                return out

            def size(self) -> int:
                return len(self.seen)

        self.n_shards = n_shards
        self.shards = [_Shard.remote() for _ in range(n_shards)]

    def index_size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dedup(self, ds, text_col: str = "text", id_col: str = "doc_id"):
        """→ Dataset of rows whose content was never seen before (here or
        in any earlier ``dedup`` call on this index)."""
        import ray

        shards, n_shards = self.shards, self.n_shards

        def keep_new(t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            h = pd.util.hash_array(
                np.asarray([s or "" for s in texts], dtype=object)
            )
            # within-batch first occurrence wins before the index sees it
            first = ~pd.Series(h).duplicated().to_numpy()
            keep = first.copy()
            sid = (h % n_shards).astype(np.int64)
            futures, routed = [], []
            for s in range(n_shards):
                rows = np.flatnonzero(first & (sid == s))
                if len(rows):
                    routed.append(rows)
                    futures.append(
                        shards[s].check_and_add.remote([int(x) for x in h[rows]])
                    )
            for rows, verdicts in zip(routed, ray.get(futures)):
                keep[rows] = verdicts
            return t.filter(pa.array(keep))

        return ds.map_batches(keep_new, batch_format="pyarrow", zero_copy_batch=True)

"""Mergeable sketches: HyperLogLog distinct counts and t-digest quantiles.

Implemented from the published algorithms (Flajolet et al. 2007 HyperLogLog;
Dunning & Ertl, "Computing extremely accurate quantiles using t-digests",
2019) with numpy-vectorized per-batch updates.  Both are associative
partials: one sketch per batch inside ``map_batches``, merged in a small
reduce stage — no shuffle (SURVEY.md §2.5).

Hashing uses ``pandas.util.hash_array`` (deterministic 64-bit, vectorized,
process-independent) so partials from different workers agree.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "HLL",
    "TDigest",
    "MisraGries",
    "hll_distinct_agg",
    "tdigest_quantile_agg",
    "frequent_items",
]


class HLL:
    """HyperLogLog with 2**p registers (default p=12 → ~1.6% rel. error)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rho = position of leftmost 1-bit in the remaining 64-p bits
        nz = rest != 0
        lead = np.full(len(hashes), 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            r = rest[nz]
            # count leading zeros via bit_length: 64 - bit_length
            bl = np.zeros(len(r), dtype=np.int64)
            v = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                step = v >> np.uint64(shift)
                has = step != 0
                bl[has] += shift
                v[has] = step[has]
            bl += 1  # bit_length
            lead[nz] = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, lead)

    def update_values(self, values: np.ndarray) -> None:
        import pandas as pd

        self.update_hashes(pd.util.hash_array(np.asarray(values)))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        am = 0.7213 / (1 + 1.079 / m)
        est = am * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


class TDigest:
    """Merging t-digest (Dunning) with the k1 (arcsine) scale function."""

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 200, means=None, weights=None) -> None:
        self.delta = delta
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(
            weights if weights is not None else [], dtype=np.float64
        )

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        w = (
            np.ones(len(values))
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, w])
        if len(self.means) > 8 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compress()
        return out

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        # Greedy k1 merge, but iterated per OUTPUT CENTROID (O(delta)
        # searchsorted jumps over the cumulative-weight array) instead of
        # per input point: each cluster starting at quantile q0 absorbs
        # every point whose inclusive cumulative weight stays within
        # k_inv(k(q0) + 1) — the same boundary the point-at-a-time greedy
        # tests, found in one binary search.  A 64K-value batch compresses
        # in ~delta iterations instead of 64K python-loop steps.
        n = len(self.means)
        if n == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        cum = np.cumsum(weights)
        total = cum[-1]
        two_pi = 2.0 * np.pi
        k_cap = self.delta / 4.0  # k(1.0): arcsin saturates at pi/2
        new_means: list[float] = []
        new_weights: list[float] = []
        i = 0
        w_so_far = 0.0
        while i < n:
            q0 = min(max(w_so_far / total, 0.0), 1.0)
            k1 = (self.delta / two_pi) * np.arcsin(2.0 * q0 - 1.0) + 1.0
            if k1 >= k_cap:
                j = n - 1  # every remaining point fits this cluster
            else:
                q_lim = (np.sin(k1 * two_pi / self.delta) + 1.0) / 2.0
                j = int(np.searchsorted(cum, q_lim * total, side="right")) - 1
                if j < i:
                    j = i  # a cluster always takes at least its seed point
            w = cum[j] - w_so_far
            new_means.append(float(np.dot(means[i : j + 1], weights[i : j + 1]) / w))
            new_weights.append(float(w))
            w_so_far = cum[j]
            i = j + 1
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        target = q * total
        return float(np.interp(target, cum, self.means))

    def to_arrays(self):
        self._compress()
        return self.means, self.weights

    def to_bytes(self) -> bytes:
        import pickle

        m, w = self.to_arrays()
        return pickle.dumps((self.delta, m, w))

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        import pickle

        delta, m, w = pickle.loads(b)
        return cls(delta, m, w)


class MisraGries:
    """Mergeable frequent-items (heavy hitters) sketch.

    Classic Misra–Gries summary with ``capacity`` counters: after summing
    ``n`` total items, every reported count is within ``n / (capacity+1)``
    of the true count, and any value with true frequency above that bound
    is guaranteed present.  ``merge`` is the standard combine-then-shrink
    (Agarwal et al., "Mergeable Summaries"): add counts, subtract the
    (capacity+1)-th largest, drop non-positives — error bounds add.

    The scale story: exact top-k over a 10⁹-cardinality column needs a
    full value exchange; MG partials are ``capacity`` counters per batch,
    merged associatively — no shuffle of the distinct set at all.
    """

    __slots__ = ("capacity", "counts", "n")

    def __init__(self, capacity: int = 64) -> None:
        self.capacity = capacity
        self.counts: dict = {}
        self.n = 0  # total items summarized (for the error bound)

    def update_values(self, vals) -> None:
        import numpy as np

        uniq, cnt = np.unique(np.asarray(vals, dtype=object), return_counts=True)
        self.n += int(cnt.sum())
        c = self.counts
        for v, k in zip(uniq.tolist(), cnt.tolist()):
            c[v] = c.get(v, 0) + int(k)
        self._shrink()

    def _shrink(self) -> None:
        c = self.counts
        if len(c) <= self.capacity:
            return
        cut = sorted(c.values(), reverse=True)[self.capacity]
        self.counts = {v: k - cut for v, k in c.items() if k > cut}

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.capacity)
        out.n = self.n + other.n
        counts = dict(self.counts)
        for v, k in other.counts.items():
            counts[v] = counts.get(v, 0) + k
        out.counts = counts
        out._shrink()
        return out

    def top(self, k: int) -> list[tuple[object, int]]:
        """(value, lower-bound count) for the k largest counters."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]

    def error_bound(self) -> int:
        """Max undercount of any reported counter: n / (capacity+1)."""
        return self.n // (self.capacity + 1)

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.capacity, self.counts, self.n))

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        import pickle

        out = cls.__new__(cls)
        out.capacity, out.counts, out.n = pickle.loads(b)
        return out


def frequent_items(ds, column: str, capacity: int = 64, k: int = 10):
    """Approximate top-``k`` values of a column via mergeable Misra–Gries
    partials: one sketch per batch (``map_batches``), associative merge on
    the driver — the distinct-value set never shuffles.
    → list of (value, count_lower_bound), plus the merged sketch."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        sk = MisraGries(capacity)
        vals = t[column].drop_null().to_numpy(zero_copy_only=False)
        if len(vals):
            sk.update_values(vals)
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = MisraGries(capacity)
    for r in rows:
        merged = merged.merge(MisraGries.from_bytes(r["sketch"]))
    return merged.top(k), merged


def hll_distinct_agg(column: str, p: int = 12):
    """HyperLogLog distinct-count as a native ``Dataset.aggregate`` /
    ``groupby(...).aggregate`` function: per-block sketch accumulation,
    associative merge, estimate at finalize — usable anywhere Ray's
    built-in aggregations are."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(sk: HLL, block) -> HLL:
        import pyarrow as pa

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        vals = block[column].drop_null().to_numpy(zero_copy_only=False)
        sk.update_values(vals.astype(object) if vals.dtype == object else vals)
        return sk

    return AggregateFn(
        init=lambda k: HLL(p),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a.merge(b),
        finalize=lambda sk: float(sk.estimate()),
        name=f"hll_distinct({column})",
    )


def tdigest_quantile_agg(column: str, q: float = 0.5, delta: int = 200):
    """t-digest quantile as a native ``Dataset.aggregate`` function."""
    import numpy as np

    from ray.data.aggregate import AggregateFn

    def accumulate_block(td: TDigest, block) -> TDigest:
        import pyarrow as pa

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        vals = block[column].drop_null().to_numpy(zero_copy_only=False)
        td.update(vals.astype(np.float64))
        return td

    return AggregateFn(
        init=lambda k: TDigest(delta),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a.merge(b),
        finalize=lambda td: float(td.quantile(q)),
        name=f"tdigest_p{int(q * 100)}({column})",
    )

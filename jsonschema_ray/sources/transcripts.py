"""Deterministic synthetic multi-turn transcript tables (FIXTURES.md §1).

The engine's primary input per BASELINE.json input_hint:

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

Everything is generated vectorized (numpy) from a fixed seed — same seed,
same rows, on every machine — and written as *partitioned* Parquet (many
part files) so Ray reads parallelize and a 100 TB-scale layout (one file
per shard) is exercised even at test scale.

Three variants:

* ``clean``  — satisfies every constraint;
* ``planted`` — a seed-derived fraction of rows violate specific checks
  (role-enum, duplicate keys, tool/role referential, text length/pattern,
  turn_idx gaps & negatives, out-of-order ts);
* ``drift``  — shifted role mix / text-length / tool-frequency
  distributions for the KS & chi-square drift tests.

Conversation lengths are Zipf-skewed with a heavy tail (a few conversations
are ~100× the median) so conv-level grouping exercises skew handling.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

__all__ = [
    "TRANSCRIPT_SCHEMA_JSON",
    "generate_transcripts",
    "transcripts_path",
]

ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("bash", "search", "python", "browser")

# The flagship Draft-4 row schema: one property per column; nullable columns
# are simply absent from "required" (a NULL field is the absent key — see
# vector/plan.py).  Compiled by jsonschema_ray.core; the vectorized plan
# (vector/plan.py) maps it onto pyarrow.compute kernels.
TRANSCRIPT_SCHEMA_JSON = json.dumps(
    {
        "type": "object",
        "required": ["conv_id", "turn_idx", "role", "text", "ts"],
        "properties": {
            "conv_id": {"type": "string", "pattern": "^conv-[0-9]{8}$"},
            "turn_idx": {"type": "integer", "minimum": 0, "maximum": 100000000},
            "role": {
                "type": "string",
                "enum": ["system", "user", "assistant", "tool"],
            },
            "text": {"type": "string", "minLength": 1, "maxLength": 2000},
            "tool": {"type": "string", "enum": list(TOOLS)},
            "ts": {"type": "string"},
        },
    }
)

_WORDS = np.array(
    [
        "the", "agent", "ran", "tool", "call", "and", "got", "result",
        "please", "check", "this", "value", "now", "compute", "sum", "of",
        "rows", "table", "query", "plan", "schema", "batch", "stream",
        "merge", "sort", "hash", "join", "filter", "naïve", "café",
        "模型", "データ", "✓done", "émit",
    ]
)


# One generation chunk: bounds the generator's peak driver memory (a
# chunk's object arrays, not the whole table's).  Tables at or under this
# size are bit-identical to the pre-chunking generator.
_GEN_CHUNK_TURNS = 6_000_000


def _conv_lengths(rng: np.random.Generator, n_turns: int) -> np.ndarray:
    """Zipf-skewed conversation lengths summing to ~n_turns."""
    lens = []
    total = 0
    while total < n_turns:
        chunk = np.minimum(rng.zipf(1.7, size=4096) * 2, 8192)
        lens.append(chunk)
        total += int(chunk.sum())
    arr = np.concatenate(lens)
    cum = np.cumsum(arr)
    k = int(np.searchsorted(cum, n_turns)) + 1
    return arr[:k].astype(np.int64)


def _gen_clean(seed: int, n_turns: int, conv_offset: int = 0):
    """Vectorized clean table; returns dict of numpy/object arrays.

    ``conv_offset`` shifts the conversation-id space so independently
    generated chunks of one logical table never share an id."""
    rng = np.random.default_rng(seed)
    lens = _conv_lengths(rng, n_turns)
    n_convs = len(lens)
    total = int(lens.sum())

    conv_ids = np.array(
        [f"conv-{i + conv_offset:08d}" for i in range(n_convs)], dtype=object
    )
    conv_id = np.repeat(conv_ids, lens)

    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, lens)).astype(
        np.int32
    )

    # Roles: optional system opener, then user/assistant alternation with
    # a tool turn (after assistant) ~12% of the time.
    has_system = np.repeat(rng.random(n_convs) < 0.3, lens)
    eff = turn_idx - has_system.astype(np.int32)
    role = np.where(eff % 2 == 0, "user", "assistant").astype(object)
    role[(turn_idx == 0) & has_system] = "system"
    tool_draw = rng.random(total) < 0.12
    is_tool = tool_draw & (role == "assistant") & (eff >= 0)
    role[is_tool] = "tool"

    tool = np.full(total, None, dtype=object)
    tool_pick = rng.integers(0, len(TOOLS), size=total)
    tool[is_tool] = np.array(TOOLS, dtype=object)[tool_pick[is_tool]]

    # Text: 3-9 vocabulary words + a deterministic tag.
    n_words = rng.integers(3, 10, size=total)
    word_ids = rng.integers(0, len(_WORDS), size=(total, 9))
    picked = _WORDS[word_ids]
    mask = np.arange(9)[None, :] < n_words[:, None]
    joined = np.where(mask, np.char.add(picked.astype(str), " "), "")
    text_base = joined[:, 0]
    for c in range(1, 9):
        text_base = np.char.add(text_base, joined[:, c])
    tag = np.char.add("t", turn_idx.astype(str))
    text = np.char.add(text_base, tag).astype(object)

    # Timestamps: per-conversation monotone non-decreasing.
    base = np.int64(1_700_000_000_000_000)  # epoch micros
    conv_start = rng.integers(0, 90 * 86400, size=n_convs) * 1_000_000
    step = rng.integers(1, 120_000_000, size=total)
    cum = np.cumsum(step)
    # per-conversation cumulative: cum[i] - cum[start] + step[start]
    cum = cum - np.repeat(cum[starts] - step[starts], lens)
    ts = base + np.repeat(conv_start, lens) + cum

    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }


def _plant(cols: dict, seed: int, fraction: float = 0.005) -> dict:
    """Mutate a seed-derived fraction of rows into known violations."""
    rng = np.random.default_rng(seed + 1)
    total = len(cols["turn_idx"])
    n_bad = max(6, int(total * fraction))
    bad = rng.choice(total, size=n_bad, replace=False)
    kinds = rng.integers(0, 6, size=n_bad)

    role, text, tool = cols["role"], cols["text"], cols["tool"]
    turn_idx, ts = cols["turn_idx"].copy(), cols["ts"].copy()

    k = bad[kinds == 0]
    role[k] = np.where(rng.random(len(k)) < 0.5, "bot", "agent")
    k = bad[kinds == 1]
    text[k] = ""  # minLength violation
    k = bad[kinds == 2]
    # referential: tool null on a tool turn / tool set on a user turn
    half = len(k) // 2
    role[k[:half]] = "tool"
    tool[k[:half]] = None
    role[k[half:]] = "user"
    tool[k[half:]] = "bash"
    k = bad[kinds == 3]
    turn_idx[k] = -1  # minimum violation (+ contiguity)
    k = bad[kinds == 4]
    turn_idx[k] = turn_idx[k] + 1_000  # gap
    k = bad[kinds == 5]
    ts[k] = ts[k] - np.int64(500_000_000_000)  # out-of-order ts

    cols = dict(cols)
    cols["turn_idx"], cols["ts"] = turn_idx, ts

    # Duplicated (conv_id, turn_idx) pairs: append copies of sampled rows.
    n_dup = max(3, n_bad // 6)
    dup = rng.choice(total, size=n_dup, replace=False)
    for name in cols:
        cols[name] = np.concatenate([cols[name], cols[name][dup]])
    return cols


def _drift(cols: dict, seed: int) -> dict:
    """Shift role mix, text length and tool frequency distributions."""
    rng = np.random.default_rng(seed + 2)
    total = len(cols["turn_idx"])
    role = cols["role"].copy()
    flip = rng.random(total) < 0.25
    role[flip & (role == "user")] = "assistant"
    text = np.char.add(cols["text"].astype(str), " padding drift extra tail words").astype(object)
    tool = cols["tool"].copy()
    drop = rng.random(total) < 0.5
    keep_tool = (role == "tool") & ~drop
    tool2 = np.full(total, None, dtype=object)
    tool2[keep_tool] = tool[keep_tool]
    role[(role == "tool") & drop] = "assistant"
    cols = dict(cols)
    cols["role"], cols["text"], cols["tool"] = role, text, tool2
    return cols


def _to_table(cols: dict):
    import pyarrow as pa

    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], type=pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], type=pa.int32()),
            "role": pa.array(cols["role"], type=pa.string()),
            "text": pa.array(cols["text"], type=pa.string()),
            "tool": pa.array(cols["tool"], type=pa.string()),
            "ts": pa.array(cols["ts"], type=pa.timestamp("us")),
        }
    )


def generate_transcripts(
    out_dir: str,
    n_turns: int = 10_000,
    seed: int = 42,
    variant: str = "planted",
    rows_per_file: int = 50_000,
) -> str:
    """Write the transcript table as partitioned Parquet; returns the dir.

    Idempotent: if the directory already holds a matching ``_SPEC.json``
    the existing data is reused (this is what makes the queries() /
    oracle_sql() pair see identical bytes).
    """
    import pyarrow.parquet as pq

    spec = {
        "n_turns": n_turns,
        "seed": seed,
        "variant": variant,
        "rows_per_file": rows_per_file,
        "gen_version": 5,
    }
    if n_turns > _GEN_CHUNK_TURNS:
        # big tables are generated in independent chunks with disjoint
        # conv-id ranges — the driver's peak memory stays one chunk's,
        # not the whole table's (a 48M-turn single-shot build held >40 GB)
        spec["chunk_turns"] = _GEN_CHUNK_TURNS
    spec_path = os.path.join(out_dir, "_SPEC.json")
    if os.path.exists(spec_path):
        try:
            with open(spec_path) as f:
                if json.load(f) == spec:
                    return out_dir
        except (ValueError, OSError):
            pass
        import shutil

        shutil.rmtree(out_dir)

    if variant not in ("planted", "drift", "clean"):
        raise ValueError(f"unknown variant {variant!r}")

    tmp_dir = out_dir + ".tmp"
    # clear any half-written tmp from a crashed previous generation — a
    # smaller rerun would otherwise rename stale part files into the
    # final dataset (payload_docs_path applies the same discipline)
    import shutil as _shutil

    _shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    file_i = 0
    done = 0
    k = 0
    while done < n_turns:
        nt = min(_GEN_CHUNK_TURNS, n_turns - done)
        cseed = seed + 7919 * k
        cols = _gen_clean(cseed, nt, conv_offset=k * 10_000_000)
        if variant == "planted":
            cols = _plant(cols, cseed)
        elif variant == "drift":
            cols = _drift(cols, cseed)
        table = _to_table(cols)
        del cols
        for lo in range(0, table.num_rows, rows_per_file):
            part = table.slice(lo, rows_per_file)
            pq.write_table(part, os.path.join(tmp_dir, f"part-{file_i:05d}.parquet"))
            file_i += 1
        del table
        done += nt
        k += 1
    with open(os.path.join(tmp_dir, "_SPEC.json"), "w") as f:
        json.dump(spec, f)
    os.replace(tmp_dir, out_dir) if not os.path.exists(out_dir) else None
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp_dir, out_dir)
    return out_dir


def payload_docs_path(n_docs: int = 1_000_000, seed: int = 42) -> str:
    """Deterministic table of raw JSON documents (doc_id, doc) — one JSON
    object per transcript turn, for the distributed slow-path validation
    bench (the direct analogue of the reference's ``Validate(data []byte)``
    over a corpus).  Cached under /tmp; ~5% of docs carry planted
    violations."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/graft_transcripts/payload-{n_docs}-{seed}-v2"
    spec_path = os.path.join(out, "_SPEC.json")
    if os.path.exists(spec_path):
        return out

    cols = _gen_clean(seed, n_docs)
    cols = _plant(cols, seed, fraction=0.02)
    n = len(cols["turn_idx"])
    ts = pd.to_datetime(cols["ts"], unit="us").strftime("%Y-%m-%dT%H:%M:%S.%f")
    conv = pd.Series(cols["conv_id"], dtype=str)
    role = pd.Series(cols["role"], dtype=str)
    text = pd.Series(cols["text"], dtype=str)
    tool = pd.Series(cols["tool"], dtype=object)
    tool_part = np.where(
        tool.isna(), "", ',"tool":"' + tool.fillna("").astype(str) + '"'
    )
    docs = (
        '{"conv_id":"'
        + conv
        + '","turn_idx":'
        + pd.Series(cols["turn_idx"]).astype(str)
        + ',"role":"'
        + role
        + '","text":"'
        + text
        + '"'
        + pd.Series(tool_part, dtype=str)
        + ',"ts":"'
        + pd.Series(np.asarray(ts), dtype=str)
        + '"}'
    )
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "doc": pa.array(docs.to_numpy(dtype=object), pa.string()),
        }
    )
    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    per_file = 25_000
    for i, lo in enumerate(range(0, n, per_file)):
        pq.write_table(table.slice(lo, per_file), os.path.join(tmp, f"part-{i:05d}.parquet"))
    with open(os.path.join(tmp, "_SPEC.json"), "w") as f:
        json.dump({"n_docs": n_docs, "seed": seed}, f)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def transcripts_path(sf_dir: str, variant: str = "planted") -> str:
    """Deterministic per-scale-factor transcript location under /tmp.

    Scale is keyed off the sf directory name so the Ray pipeline and the
    DuckDB oracle (``read_parquet`` over the same files) see identical data:
    sf0.001 → ~6k turns, sf0.01 → ~60k, sf0.1 → ~600k.
    """
    name = os.path.basename(os.path.normpath(sf_dir))
    turns = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}.get(name, 60_000)
    tag = hashlib.md5(f"{name}|{variant}|v5".encode()).hexdigest()[:8]
    out = f"/tmp/graft_transcripts/{name}-{variant}-{tag}"
    return generate_transcripts(out, n_turns=turns, seed=42, variant=variant)

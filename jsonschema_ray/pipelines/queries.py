"""Driver-facing query implementations + their ANSI-SQL oracles.

Every operator from SURVEY.md §2 that is SQL-expressible gets a pair
(`q_*` Ray implementation, oracle SQL string) — the driver runs both at
sf0.01 and compares row-count + schema + order-insensitive value hash.
Column names/types are kept identical on both sides; floats are rounded
to fixed decimals on both sides before comparison.

The transcripts tables aren't part of the driver's sf dirs; they're
generated deterministically (seed 42) under /tmp keyed by the sf dir name,
and the oracle SQL reads the *same parquet files* via read_parquet().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.transcripts import TOOLS, TRANSCRIPT_SCHEMA_JSON, transcripts_path
from ..stages.bucketing import from_pandas_clean, pandas_map
from ..stages.checks import (
    contiguity_violations,
    duplicate_key_violations,
    referential_violations,
    ts_order_violations,
)

# ---------------------------------------------------------------------------
# transcripts: row-level violations (fail-fast parity) --------------------


def _ds(path_or_dir):
    import ray.data as rd

    return rd.read_parquet(path_or_dir)


def q_row_violations(sf_dir: str):
    """First-violation-per-row over the planted transcripts (hot path)."""
    from .validate_pipeline import TRANSCRIPT_ARROW_SCHEMA

    from ..stages.validate import validate_rows_batch

    path = transcripts_path(sf_dir)
    # stateless tasks + per-worker compiled-plan cache: same semantics as
    # the VectorValidator actor pool (differential-tested twins), without
    # the 1-2 s pool spin-up that dominates a second-scale invocation
    return _ds(path).map_batches(
        validate_rows_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            schema_json=TRANSCRIPT_SCHEMA_JSON,
            arrow_schema=TRANSCRIPT_ARROW_SCHEMA,
            mode="first",
        ),
    )


def row_violations_sql(path: str) -> str:
    """The fail-fast CASE chain in the reference's evaluation order
    (validate.go:29-77,452-515): per-column property checks in arrow column
    order, then required."""
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet')),
v AS (
  SELECT conv_id, turn_idx,
    CASE
      WHEN conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^conv-[0-9]{{8}}$') THEN 'pattern'
      WHEN turn_idx IS NOT NULL AND turn_idx < 0 THEN 'minimum'
      WHEN turn_idx IS NOT NULL AND turn_idx > 100000000 THEN 'maximum'
      WHEN role IS NOT NULL AND role NOT IN ('system','user','assistant','tool') THEN 'enum'
      WHEN text IS NOT NULL AND length(text) < 1 THEN 'minLength'
      WHEN text IS NOT NULL AND length(text) > 2000 THEN 'maxLength'
      WHEN tool IS NOT NULL AND tool NOT IN ({tools}) THEN 'enum'
      WHEN conv_id IS NULL THEN 'required'
      WHEN turn_idx IS NULL THEN 'required'
      WHEN role IS NULL THEN 'required'
      WHEN text IS NULL THEN 'required'
      WHEN ts IS NULL THEN 'required'
    END AS keyword,
    CASE
      WHEN conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^conv-[0-9]{{8}}$')
        THEN 'object: "conv_id": string: does not match pattern ^conv-[0-9]{{8}}$'
      WHEN turn_idx IS NOT NULL AND turn_idx < 0
        THEN 'object: "turn_idx": number: value ' || turn_idx || '/1 is smaller than 0/1'
      WHEN turn_idx IS NOT NULL AND turn_idx > 100000000
        THEN 'object: "turn_idx": number: value ' || turn_idx || '/1 is bigger than 100000000/1'
      WHEN role IS NOT NULL AND role NOT IN ('system','user','assistant','tool')
        THEN 'object: "role": enum: "\\"' || role || '\\"" is not present in enum'
      WHEN text IS NOT NULL AND length(text) < 1
        THEN 'object: "text": string: length is smaller than 1'
      WHEN text IS NOT NULL AND length(text) > 2000
        THEN 'object: "text": string: length is bigger than 2000'
      WHEN tool IS NOT NULL AND tool NOT IN ({tools})
        THEN 'object: "tool": enum: "\\"' || tool || '\\"" is not present in enum'
      WHEN conv_id IS NULL THEN 'object: required property "conv_id" is missing'
      WHEN turn_idx IS NULL THEN 'object: required property "turn_idx" is missing'
      WHEN role IS NULL THEN 'object: required property "role" is missing'
      WHEN text IS NULL THEN 'object: required property "text" is missing'
      WHEN ts IS NULL THEN 'object: required property "ts" is missing'
    END AS message
  FROM t)
SELECT conv_id, turn_idx, keyword, message FROM v WHERE keyword IS NOT NULL
"""


def q_referential(sf_dir: str):
    return referential_violations(_ds(transcripts_path(sf_dir)))


def referential_sql(path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet'))
SELECT conv_id, turn_idx, 'referential' AS keyword,
       'tool must be set when role is "tool"' AS message
FROM t WHERE role = 'tool' AND tool IS NULL
UNION ALL
SELECT conv_id, turn_idx, 'referential',
       'tool must be null when role is ' ||
       CASE WHEN role IS NULL THEN 'null' ELSE '"' || role || '"' END
FROM t WHERE (role IS NULL OR role <> 'tool') AND tool IS NOT NULL
"""


def q_duplicate_keys(sf_dir: str):
    return duplicate_key_violations(_ds(transcripts_path(sf_dir)))


def duplicate_keys_sql(path: str) -> str:
    return f"""
SELECT conv_id, turn_idx, 'uniqueItems' AS keyword,
       '(conv_id, turn_idx) appears ' || COUNT(*) || ' times' AS message
FROM read_parquet('{path}/*.parquet')
GROUP BY conv_id, turn_idx HAVING COUNT(*) > 1
"""


def q_contiguity(sf_dir: str):
    return contiguity_violations(_ds(transcripts_path(sf_dir)))


def contiguity_sql(path: str) -> str:
    return f"""
WITH s AS (
  SELECT conv_id, turn_idx,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         LAG(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{path}/*.parquet'))
SELECT conv_id, turn_idx, 'contiguity' AS keyword,
  CASE WHEN rn = 1
       THEN 'turn_idx ' || turn_idx || ' at conversation start: expected 0'
       ELSE 'turn_idx ' || turn_idx || ' does not follow ' || prev END AS message
FROM s
WHERE (rn = 1 AND turn_idx <> 0)
   OR (rn > 1 AND turn_idx <> prev + 1 AND turn_idx <> prev)
"""


def q_ts_order(sf_dir: str):
    return ts_order_violations(_ds(transcripts_path(sf_dir)))


def ts_order_sql(path: str) -> str:
    return f"""
WITH s AS (
  SELECT conv_id, turn_idx, ts,
         MAX(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM read_parquet('{path}/*.parquet'))
SELECT conv_id, turn_idx, 'order' AS keyword,
       'ts decreases within conversation' AS message
FROM s WHERE ts < prev_max
"""


def q_violation_summary(sf_dir: str):
    """Flagship rollup: all checks → count per keyword."""
    from .validate_pipeline import transcript_violations

    ds = _ds(transcripts_path(sf_dir))
    viol = transcript_violations(ds)
    out = viol.groupby("keyword").count()
    return out.map_batches(
        lambda t: t.rename_columns(["keyword", "n"]), batch_format="pyarrow"
    ).sort("keyword")


def violation_summary_sql(path: str) -> str:
    parts = [
        row_violations_sql(path),
        referential_sql(path),
        duplicate_keys_sql(path),
        contiguity_sql(path),
        ts_order_sql(path),
    ]
    union = "\nUNION ALL\n".join(f"SELECT * FROM ({p})" for p in parts)
    return f"SELECT keyword, CAST(COUNT(*) AS BIGINT) AS n FROM ({union}) GROUP BY keyword ORDER BY keyword"


# ---------------------------------------------------------------------------
# events: distributed raw-JSON payload validation --------------------------

EVENT_PROPS_SCHEMA = """
{
  "type": "object",
  "required": ["k"],
  "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}}
}
"""


def q_payload_violations(sf_dir: str):
    """Validate the ``props`` JSON column of events per row — the direct
    distributed analogue of the reference's Schema.Validate(data)
    (validate.go:15-21)."""
    import ray.data as rd

    from ..stages.validate import validate_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    # stateless tasks + per-worker compile cache: no actor-pool spin-up
    return ds.map_batches(
        validate_payload_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            schema_json=EVENT_PROPS_SCHEMA,
            payload_col="props",
            id_cols=("event_id",),
        ),
    )


PAYLOAD_SQL = """
SELECT event_id,
  CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 'maximum' END AS keyword,
  'object: "k": number: value ' || (props->>'k') || '/1 is bigger than 50/1' AS message
FROM events
WHERE CAST(props->>'k' AS BIGINT) > 50
"""


# ---------------------------------------------------------------------------
# classic relational ops (general engine capability) ------------------------


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style grouped aggregate, fully combiner-shaped: each batch
    reduces to one partial row per (returnflag, linestatus) — ~6 groups —
    so NO exchange is needed at all; the bounded partial set (groups ×
    blocks) merges on the driver.  At 100 TB the partials are still
    (6 groups × nblocks) tiny rows, the same pattern as the stats
    profile's sketch merge."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "qty": t["l_quantity"].to_pandas(),
                "rev": rev.to_pandas(),
                "disc": t["l_discount"].to_pandas(),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                sum_rev=("rev", "sum"),
                sum_disc=("disc", "sum"),
                n=("qty", "size"),
            )
            .reset_index()
        )
        return from_pandas_clean(g)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["l_returnflag", "l_linestatus"], sort=False)
        .agg(
            sum_qty=("sum_qty", "sum"),
            sum_rev=("sum_rev", "sum"),
            sum_disc=("sum_disc", "sum"),
            n=("n", "sum"),
        )
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
                "sum_qty": pa.array(out["sum_qty"].round(2), pa.float64()),
                "sum_rev": pa.array(out["sum_rev"].round(2), pa.float64()),
                "avg_disc": pa.array(
                    (out["sum_disc"] / out["n"]).round(4), pa.float64()
                ),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )
    )


LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str):
    """Broadcast join: tiny customer dim shipped once via ray.put, looked
    up per batch — no shuffle (SURVEY.md §2.6 joins/lookups)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    # broadcast the dim SORTED: the per-batch lookup is a vectorized
    # searchsorted + dictionary gather (int codes), no per-row dict .map
    keys = cust["c_custkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    segs = cust["c_mktsegment"].to_numpy(object)[order]
    uniq, codes = np.unique(segs, return_inverse=True)
    lookup_ref = ray.put((keys[order], codes.astype(np.int32), list(uniq)))

    def seg_join(t: pa.Table, ref) -> pa.Table:
        skeys, scodes, names = ray.get(ref)  # plasma-cached, zero-copy arrays
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(skeys) == 0:
            hit = np.zeros(len(ck), dtype=bool)
        else:
            idx = np.searchsorted(skeys, ck)
            idx_c = np.minimum(idx, len(skeys) - 1)
            hit = skeys[idx_c] == ck
        # INNER join semantics, exactly the oracle's JOIN: unmatched
        # orders DROP (keeping them with a null segment both diverged
        # from the SQL and crashed Ray's sort on the null key)
        t = t.filter(pa.array(hit))
        if t.num_rows == 0:
            return t.append_column("c_mktsegment", pa.nulls(0, pa.string()))
        code = scodes[idx_c[hit]].astype(np.int32)
        seg = pa.DictionaryArray.from_arrays(
            pa.array(code), pa.array(names, pa.string())
        ).cast(pa.string())
        return t.append_column("c_mktsegment", seg)

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(
            seg_join, batch_format="pyarrow", fn_kwargs=dict(ref=lookup_ref)
        )
        .groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice", alias_name="revenue"))
    )
    return (
        out.map_batches(
            lambda t: pa.table(
                {
                    "c_mktsegment": t["c_mktsegment"],
                    "revenue": pc.round(t["revenue"], 2),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("c_mktsegment")
    )


SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def _distinct_counts_onepass(path: str, cols: tuple[str, ...]) -> dict[str, int]:
    """One-pass exact distinct counts for several string columns: each
    batch emits its (column, value) uniques (the combiner — one row per
    batch-distinct value, no NULLs), ONE value-keyed exchange dedupes
    across batches and counts per column per bucket, and the driver sums
    the ≤len(cols) rows per bucket."""
    import numpy as np
    import ray.data as rd

    from ..stages.bucketing import bucketed_map_groups

    ds = rd.read_parquet(path, columns=list(cols))

    def partials(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = t[c].combine_chunks().drop_null().unique()
            names.append(np.full(len(u), c, dtype=object))
            vals.append(u.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "column_name": pa.array(np.concatenate(names), pa.string()),
                "value": pa.array(np.concatenate(vals), pa.string()),
            }
        )

    def count_bucket(df):
        return (
            df.drop_duplicates(["column_name", "value"])
            .groupby("column_name", sort=False)
            .size()
            .reset_index(name="n_distinct")
        )

    per_bucket = bucketed_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["value"],
        count_bucket,
        out_schema=pa.schema(
            [("column_name", pa.string()), ("n_distinct", pa.int64())]
        ),
    ).to_pandas()
    return (
        per_bucket.groupby("column_name", sort=False)["n_distinct"].sum().to_dict()
    )


def q_building_orders(sf_dir: str):
    """Orders of BUILDING-segment customers via the Bloom-prefiltered
    semi-join: the small filtered customer side compacts into a broadcast
    Bloom filter that drops non-matching orders BEFORE the exchange; the
    exact hash semi-join resolves the false positives."""
    import ray.data as rd

    from ..stages.joins import bloom_semi_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
    )
    return bloom_semi_join(
        orders, cust, on="o_custkey", left_cols=["o_orderkey", "o_totalprice"]
    )


BUILDING_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def q_distinct_exact(sf_dir: str):
    """Exact distinct counts via hash-partitioned groupby (the exact
    counterpart of the HLL sketch); see :func:`_distinct_counts_onepass`."""
    path = transcripts_path(sf_dir)
    cols = ("conv_id", "role", "tool")
    counts = _distinct_counts_onepass(path, cols)
    return pa.Table.from_pylist(
        [
            {"column_name": c, "n_distinct": int(counts.get(c, 0))}
            for c in sorted(cols)
        ]
    )


def distinct_exact_sql(path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet'))
SELECT 'conv_id' AS column_name, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_distinct FROM t
UNION ALL
SELECT 'role', CAST(COUNT(DISTINCT role) AS BIGINT) FROM t
UNION ALL
SELECT 'tool', CAST(COUNT(DISTINCT tool) AS BIGINT) FROM t
"""


def q_convs_per_role(sf_dir: str):
    """Exact distinct conversations per role — the grouped COUNT(DISTINCT)
    pattern via two combiner exchanges (pairs never duplicate, hot roles
    spread across buckets by pair hash)."""
    import ray.data as rd

    from ..stages.stats import grouped_distinct_exact

    path = transcripts_path(sf_dir)
    ds = rd.read_parquet(path, columns=["role", "conv_id"])
    return grouped_distinct_exact(ds, "role", "conv_id")


def convs_per_role_sql(path: str) -> str:
    return f"""
SELECT role, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_distinct
FROM read_parquet('{path}/*.parquet')
WHERE role IS NOT NULL AND conv_id IS NOT NULL
GROUP BY role
"""


def q_streaming_dedup(sf_dir: str):
    """Incremental dedup against a fresh sharded seen-content index (the
    raw-actor shared-index pattern); projected to the content column so
    the result is order-independent — which row of a duplicate set
    arrives first is a race, but the surviving content set is exact."""
    import ray.data as rd

    from ..stages.streaming import StreamingDeduper

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    dd = StreamingDeduper(n_shards=4)
    return dd.dedup(ds).map_batches(
        lambda t: t.select(["text"]), batch_format="pyarrow"
    )


STREAMING_DEDUP_SQL = """
SELECT DISTINCT text FROM documents
"""


def q_stats_minmax(sf_dir: str):
    """Null/min/max per column from the mergeable profile partials."""
    import ray.data as rd

    from ..stages.stats import profile_dataset

    path = transcripts_path(sf_dir)
    prof = profile_dataset(rd.read_parquet(path), columns=["turn_idx", "text"])
    rows = [
        {
            "column_name": "turn_idx",
            "n": prof["turn_idx"]["count"],
            "nulls": prof["turn_idx"]["nulls"],
            "min_v": int(prof["turn_idx"]["min"]),
            "max_v": int(prof["turn_idx"]["max"]),
        },
        {
            "column_name": "text",
            "n": prof["text"]["count"],
            "nulls": prof["text"]["nulls"],
            "min_v": None,
            "max_v": None,
        },
    ]
    return pa.Table.from_pylist(rows)


def stats_minmax_sql(path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet'))
SELECT 'turn_idx' AS column_name, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(turn_idx) AS BIGINT) AS nulls,
       CAST(MIN(turn_idx) AS BIGINT) AS min_v, CAST(MAX(turn_idx) AS BIGINT) AS max_v
FROM t
UNION ALL
SELECT 'text', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(text) AS BIGINT), NULL, NULL
FROM t
"""


# ---------------------------------------------------------------------------
# training-data ops: dedup / similarity / text analysis ---------------------


def q_exact_dedup(sf_dir: str):
    """Exact content dedup of documents (group-by-content, keep min id)."""
    import ray.data as rd

    from ..stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds, key="text")


EXACT_DEDUP_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id_kept,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
"""


def q_token_stats(sf_dir: str):
    import ray.data as rd

    from ..stages.text import token_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_stats(ds)


TOKEN_STATS_SQL = r"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS n_subtokens
FROM documents
"""


def q_quality_scores(sf_dir: str):
    import ray.data as rd

    from ..stages.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_scores(ds)


QUALITY_SQL = r"""
WITH s AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         CAST(len(list_filter(toks, x -> x IN ('the','and','of','a','to','in','is','it'))) AS DOUBLE) / len(toks) END, 6) AS stop_ratio,
       ROUND(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / len(toks) END, 6) AS mean_token_len
FROM s
"""


def q_lang_id(sf_dir: str):
    import ray.data as rd

    from ..stages.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(ds)


LANG_ID_SQL = r"""
WITH s AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
sc AS (SELECT doc_id,
  len(list_filter(toks, x -> x IN ('der','und'))) AS de,
  len(list_filter(toks, x -> x IN ('the','and'))) AS en,
  len(list_filter(toks, x -> x IN ('el','y')))   AS es,
  len(list_filter(toks, x -> x IN ('le','et')))  AS fr,
  len(list_filter(toks, x -> x IN ('的','是')))  AS zh
FROM s)
SELECT doc_id,
  CASE WHEN greatest(de,en,es,fr,zh) = 0 THEN 'und'
       WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
       WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
       WHEN es >= fr AND es >= zh THEN 'es'
       WHEN fr >= zh THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM sc
"""


def q_jaccard_pairs(sf_dir: str):
    """Exact all-pairs word-3-gram Jaccard ≥ 0.5 via shingle inverted index."""
    import ray.data as rd

    from ..stages.dedup import jaccard_pairs_exact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return jaccard_pairs_exact(ds, threshold=0.5)


JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT p.a, p.b,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
FROM pairs p JOIN sizes sa ON p.a = sa.doc_id JOIN sizes sb ON p.b = sb.doc_id
WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5
"""


def q_dedup_clusters(sf_dir: str):
    """Connected components of the ≥0.5-Jaccard similarity graph — the
    cluster labels near-dup dedup keeps one representative per.  The SQL
    oracle recomputes components with a recursive CTE over the same
    pairs."""
    from ..stages.dedup import jaccard_pairs_exact
    from ..stages.graph import connected_components

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return connected_components(jaccard_pairs_exact(docs, threshold=0.5))


DEDUP_CLUSTERS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT p.a, p.b
  FROM cand p JOIN sizes sa ON p.a = sa.doc_id JOIN sizes sb ON p.b = sb.doc_id
  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)
SELECT node, CAST(MIN(lab) AS BIGINT) AS component FROM reach GROUP BY node
"""


def q_curate(sf_dir: str):
    """The full curation chain — exact dedup → near-dup cluster dedup →
    quality gate — with every stage mirrored in one SQL oracle (recursive
    CTE for the cluster labels)."""
    import ray.data as rd

    from .curate import curate_corpus

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # pair_method pinned to the SQL-expressible exact path: the oracle's
    # recursive CTE enumerates exact-Jaccard pairs.  Production default is
    # "auto" (density-routed; see pipelines/curate.py).
    return curate_corpus(
        ds,
        jaccard_threshold=0.5,
        min_tokens=5,
        max_stop_ratio=0.18,
        pair_method="exact",
    )


CURATE_SQL = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, text FROM documents x
  WHERE doc_id = (SELECT MIN(doc_id) FROM documents y WHERE y.text = x.text)),
toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM d),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM toks CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
cand AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
         FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT p.a, p.b FROM cand p
          JOIN sizes sa ON p.a = sa.doc_id JOIN sizes sb ON p.b = sb.doc_id
          WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, lab) AS (SELECT src, src FROM edges UNION
                     SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
surv AS (SELECT doc_id, text FROM d
         WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)),
q AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS t FROM surv)
SELECT doc_id, text FROM q
WHERE len(t) >= 5
  AND ROUND(CASE WHEN len(t) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(t, x -> x IN ('the','and','of','a','to','in','is','it'))) AS DOUBLE)
      / len(t) END, 6) <= 0.18
"""


def q_cosine_topk(sf_dir: str):
    """Exact brute-force cosine top-5 for query vectors 0..9."""
    import ray.data as rd

    from ..stages.ann import cosine_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return cosine_topk(ds, query_ids=list(range(10)), k=5)


COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
r AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM s)
SELECT query_id, vec_id, CAST(rn AS BIGINT) AS rank, sim FROM r WHERE rn <= 5
"""


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidates verified with exact Jaccard
    (rows-only: LSH recall is probabilistic; tested against the exact
    inverted-index pairs in pytest)."""
    import ray.data as rd

    from ..stages.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5)


def q_simhash(sf_dir: str):
    """64-bit SimHash per document — full value oracle: the token hash is
    a byte polynomial + splitmix64 mix replicated in DuckDB HUGEINT
    arithmetic (stages/tokhash.py TOKHASH_SQL_MACROS), so the oracle
    recomputes every signature bit-exactly from the raw text."""
    import ray.data as rd

    from ..stages.dedup import simhash64

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash64(ds)


def _simhash_cte() -> str:
    from ..stages.tokhash import TOKHASH_SQL_MACROS

    return (
        TOKHASH_SQL_MACROS
        + r"""
CREATE OR REPLACE MACRO i64(v) AS CAST(CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616 ELSE v END AS BIGINT);
WITH toks AS (
  SELECT doc_id, list_transform(regexp_extract_all(COALESCE(text, ''), '[^\t\n\f\r ]+'),
                                t -> tokhash(t)) AS hs
  FROM documents),
sim AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN 0 ELSE i64(list_sum(list_transform(range(0, 64), b ->
      CASE WHEN 2 * list_sum(list_transform(hs, h -> CAST((CAST(h AS HUGEINT) >> b) % 2 AS BIGINT))) > len(hs)
           THEN u64(CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END))) END AS simhash
  FROM toks)
"""
    )


SIMHASH_SQL = _simhash_cte() + "SELECT doc_id, simhash FROM sim"

SIMHASH_PAIRS_SQL = (
    _simhash_cte()
    + """
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sim x JOIN sim y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""
)


def q_sample(sf_dir: str):
    """Reproducible 10% corpus sample by id residue — no shuffle, no RNG
    state, stable across reruns/partitionings (resume-safe)."""
    import ray.data as rd

    from ..stages.sampling import deterministic_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return deterministic_sample(ds, "doc_id", modulus=10, keep_below=1)


SAMPLE_SQL = """
SELECT doc_id, text FROM documents WHERE doc_id % 10 < 1
"""


def q_grouped_head(sf_dir: str):
    """First 3 events per event type by (ts, event_id) — per-group limit
    with a lossless local-first-k combiner before the exchange."""
    import ray.data as rd

    from ..stages.sampling import grouped_head

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"]
    )
    return grouped_head(ds, ["event_type"], ["ts", "event_id"], k=3)


GROUPED_HEAD_SQL = """
SELECT event_id, event_type, ts FROM (
  SELECT event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn <= 3
"""


def q_running_value(sf_dir: str):
    """Per-type running sum of event values ordered by (ts, event_id) —
    the SQL window ``SUM(value) OVER (PARTITION BY … ORDER BY …)`` as one
    key-hashed exchange + vectorized per-bucket prefix sums."""
    import ray.data as rd

    from ..stages.window import grouped_running_sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts", "value"]
    )
    return grouped_running_sum(ds, ["event_type"], ["ts", "event_id"], "value")


RUNNING_VALUE_SQL = """
SELECT event_id, event_type, ts, value,
       ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY ts, event_id), 6)
         AS running_sum
FROM events
"""


def q_median_by_type(sf_dir: str):
    """Exact per-type value median (quantile_cont semantics); the t-digest
    sketch is the scale path when a group outgrows a bucket."""
    import ray.data as rd

    from ..stages.window import grouped_quantile

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantile(ds, ["event_type"], "value", q=0.5)


MEDIAN_BY_TYPE_SQL = """
SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS q50
FROM events GROUP BY event_type
"""


def q_frequent_tokens(sf_dir: str):
    """Top-10 corpus tokens via the mergeable Misra–Gries sketch — one
    64-counter partial per batch, associative merge, no shuffle of the
    distinct set.  The corpus vocabulary (31 tokens) is under the sketch
    capacity, so counts are exact and the SQL oracle applies; past
    capacity the same pipeline degrades gracefully to ±n/(capacity+1)
    lower bounds (pytest asserts that regime)."""
    import numpy as np
    import ray.data as rd

    from ..stages.sketches import frequent_items

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(t["text"].combine_chunks().fill_null(""))
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    top, _sk = frequent_items(
        ds.map_batches(explode, batch_format="pyarrow"), "token", capacity=64, k=10
    )
    return pa.table(
        {
            "token": pa.array([v for v, _ in top], pa.string()),
            "n": pa.array(np.asarray([c for _, c in top], dtype=np.int64)),
        }
    )


FREQUENT_TOKENS_SQL = r"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS token
  FROM documents WHERE text IS NOT NULL)
GROUP BY token ORDER BY n DESC, token LIMIT 10
"""


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole banding +
    exact popcount verify (rows-only: the hash family is engine-internal;
    pytest holds the brute-force oracle)."""
    import ray.data as rd

    from ..stages.dedup import simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def q_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints — full value oracle: the 64-bit
    polynomial (full doc + min 16-codepoint window) is recomputed in
    DuckDB HUGEINT arithmetic character by character."""
    import ray.data as rd

    from ..stages.text import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprints(ds)


def _fingerprints_sql() -> str:
    from ..stages.tokhash import TOKHASH_SQL_MACROS

    return (
        TOKHASH_SQL_MACROS
        + """
CREATE OR REPLACE MACRO i64(v) AS CAST(CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616 ELSE v END AS BIGINT);
WITH d AS (SELECT doc_id, COALESCE(text, '') AS txt,
                  length(COALESCE(text, '')) AS L FROM documents)
SELECT doc_id,
  CASE WHEN L = 0 THEN 0 ELSE i64(tokpoly(txt)) END AS fp_full,
  CASE WHEN L = 0 THEN 0
       WHEN L < 16 THEN i64(tokpoly(txt))
       ELSE i64(list_min(list_transform(range(1, L - 14), j -> tokpoly(substr(txt, j, 16)))))
  END AS fp_min_window
FROM d
"""
    )


FINGERPRINTS_SQL = _fingerprints_sql()


def q_hll_distinct(sf_dir: str):
    """HLL estimates cross-checked in-pipeline against the exact one-pass
    distinct counts.  Output (column_name, n_exact, hll_within_5pct): the
    SQL oracle recomputes n_exact with COUNT(DISTINCT) and asserts the HLL
    bound held — if a sketch drifts past 5% relative error, the boolean
    flips and the oracle hash mismatches."""
    import pyarrow as _pa
    import ray.data as rd

    from ..stages.stats import profile_dataset

    path = transcripts_path(sf_dir)
    cols = ("conv_id", "role", "text")
    prof = profile_dataset(rd.read_parquet(path), columns=list(cols))
    exact = _distinct_counts_onepass(path, cols)
    rows = []
    for c in sorted(cols):
        est = float(prof[c]["distinct_hll"])
        n = int(exact.get(c, 0))
        rows.append(
            {
                "column_name": c,
                "n_exact": n,
                "hll_within_5pct": bool(n > 0 and abs(est - n) / n <= 0.05),
            }
        )
    return _pa.Table.from_pylist(rows)


def hll_distinct_sql(path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet'))
SELECT 'conv_id' AS column_name, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_exact, TRUE AS hll_within_5pct FROM t
UNION ALL
SELECT 'role', CAST(COUNT(DISTINCT role) AS BIGINT), TRUE FROM t
UNION ALL
SELECT 'text', CAST(COUNT(DISTINCT text) AS BIGINT), TRUE FROM t
"""


def q_drift_stats(sf_dir: str):
    """Exact KS / chi-square drift statistics, drift variant vs clean.
    Both are classical closed-form statistics over per-value counts, so
    the SQL oracle recomputes them with window functions."""
    import pyarrow as _pa
    import ray.data as rd

    from ..stages.drift import drift_compare, drift_profile

    clean = drift_profile(rd.read_parquet(transcripts_path(sf_dir, "clean")))
    drifted = drift_profile(rd.read_parquet(transcripts_path(sf_dir, "drift")))
    stats = drift_compare(clean, drifted)
    rows = [
        {"feature": col, "stat": name, "value": float(v)}
        for col, st in sorted(stats.items())
        for name, v in sorted(st.items())
    ]
    return _pa.Table.from_pylist(rows)


def _chi2_sql(feature: str, col: str, clean: str, drift: str) -> str:
    """X² = Σ (O-E)²/E with E scaled to the candidate total; unseen
    baseline categories get the 0.5 floor (drift.py:_chi2_stat)."""
    return f"""
SELECT '{feature}' AS feature, 'chi2' AS stat, ROUND(SUM(POW(oc - e, 2) / e), 6) AS value
FROM (
  SELECT COALESCE(o.c, 0) AS oc,
         CASE WHEN COALESCE(b.c, 0) = 0 THEN 0.5
              ELSE CAST(b.c AS DOUBLE) / (SELECT SUM(c) FROM (
                     SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
                     FROM read_parquet('{clean}/*.parquet') GROUP BY 1))
                   * (SELECT SUM(c) FROM (
                     SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
                     FROM read_parquet('{drift}/*.parquet') GROUP BY 1))
         END AS e
  FROM (SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
        FROM read_parquet('{clean}/*.parquet') GROUP BY 1) b
  FULL OUTER JOIN
       (SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
        FROM read_parquet('{drift}/*.parquet') GROUP BY 1) o
  ON b.k = o.k
)
"""


def _psi_sql(feature: str, col: str, clean: str, drift: str) -> str:
    """PSI = Σ (p_o − p_b)·ln(p_o/p_b), 0.5-count floor on absent
    categories, raw-count totals (drift.py:_psi_stat)."""
    return f"""
SELECT '{feature}' AS feature, 'psi' AS stat, ROUND(SUM((po - pb) * ln(po / pb)), 6) AS value
FROM (
  SELECT GREATEST(COALESCE(b.c, 0), 0.5)
           / (SELECT CAST(COUNT(*) AS DOUBLE) FROM read_parquet('{clean}/*.parquet')) AS pb,
         GREATEST(COALESCE(o.c, 0), 0.5)
           / (SELECT CAST(COUNT(*) AS DOUBLE) FROM read_parquet('{drift}/*.parquet')) AS po
  FROM (SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
        FROM read_parquet('{clean}/*.parquet') GROUP BY 1) b
  FULL OUTER JOIN
       (SELECT COALESCE({col}, '∅null') AS k, COUNT(*) AS c
        FROM read_parquet('{drift}/*.parquet') GROUP BY 1) o
  ON b.k = o.k
)
"""


def _ks_sql(feature: str, expr: str, clean: str, drift: str) -> str:
    """Two-sample KS D = max |F1 - F2| over exact per-value histograms."""
    return f"""
SELECT '{feature}' AS feature, 'ks' AS stat, ROUND(MAX(ABS(fa - fb)), 6) AS value
FROM (
  SELECT SUM(ca) OVER (ORDER BY v) / (SELECT CAST(SUM(ca) AS DOUBLE) FROM j_{feature}) AS fa,
         SUM(cb) OVER (ORDER BY v) / (SELECT CAST(SUM(cb) AS DOUBLE) FROM j_{feature}) AS fb
  FROM j_{feature}
)
"""


def drift_stats_sql(clean: str, drift: str) -> str:
    def hist_cte(feature: str, expr: str) -> str:
        return f"""
j_{feature} AS (
  SELECT COALESCE(a.v, b.v) AS v, COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb
  FROM (SELECT {expr} AS v, COUNT(*) AS c FROM read_parquet('{clean}/*.parquet')
        WHERE {expr} IS NOT NULL GROUP BY 1) a
  FULL OUTER JOIN
       (SELECT {expr} AS v, COUNT(*) AS c FROM read_parquet('{drift}/*.parquet')
        WHERE {expr} IS NOT NULL GROUP BY 1) b
  ON a.v = b.v
)"""

    return (
        "WITH "
        + ",".join([hist_cte("text_len", "length(text)"), hist_cte("turn_idx", "turn_idx")])
        + _chi2_sql("role", "role", clean, drift)
        + " UNION ALL "
        + _chi2_sql("tool", "tool", clean, drift)
        + " UNION ALL "
        + _psi_sql("role", "role", clean, drift)
        + " UNION ALL "
        + _psi_sql("tool", "tool", clean, drift)
        + " UNION ALL "
        + _ks_sql("text_len", "length(text)", clean, drift)
        + " UNION ALL "
        + _ks_sql("turn_idx", "turn_idx", clean, drift)
    )


def q_decode_features(sf_dir: str):
    """Multimodal plumbing: binary payload → actor-pool decode features.
    The fake codec is deterministic over the payload bytes, so the SQL
    oracle recomputes width/height/checksum from the text (ASCII corpus:
    byte i == character i)."""
    import ray.data as rd

    from ..stages.multimodal import attach_payload, decode_features

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_features(attach_payload(ds))


# Recomputes DecodeStage's fake codec (multimodal.py): payload = utf8 text,
# width/height from first/last byte, checksum = little-endian uint64 of the
# first 8 bytes with bit 63 cleared (byte values ≤ 127 here, so the mask is
# a no-op and each term fits BIGINT).
DECODE_FEATURES_SQL = """
WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents)
SELECT doc_id,
  CASE WHEN length(t)=0 THEN 0 ELSE 16 + (ascii(substr(t,1,1)) % 64) * 8 END AS width,
  CASE WHEN length(t)=0 THEN 0 ELSE 16 + (ascii(substr(t,length(t),1)) % 64) * 8 END AS height,
  CAST(CASE WHEN length(t)=0 THEN 0 ELSE
      ascii(substr(t,1,1))
    + CASE WHEN length(t)>=2 THEN ascii(substr(t,2,1))*256 ELSE 0 END
    + CASE WHEN length(t)>=3 THEN ascii(substr(t,3,1))*65536 ELSE 0 END
    + CASE WHEN length(t)>=4 THEN ascii(substr(t,4,1))*16777216 ELSE 0 END
    + CASE WHEN length(t)>=5 THEN ascii(substr(t,5,1))*4294967296 ELSE 0 END
    + CASE WHEN length(t)>=6 THEN ascii(substr(t,6,1))*1099511627776 ELSE 0 END
    + CASE WHEN length(t)>=7 THEN ascii(substr(t,7,1))*281474976710656 ELSE 0 END
    + CASE WHEN length(t)>=8 THEN ascii(substr(t,8,1))*72057594037927936 ELSE 0 END
  END AS BIGINT) AS checksum
FROM d
"""


def q_resize_decode(sf_dir: str):
    """Multimodal chain: attach binary payload → actor-pool resize (fake
    codec, 64×64 target) → decode features.  The byte transform is
    deterministic (payload repeats to w·h/1024+8 = 12 bytes), so the SQL
    oracle recomputes every feature from the text with modulo indexing."""
    import ray.data as rd

    from ..stages.multimodal import attach_payload, decode_features, resize

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_features(resize(attach_payload(ds), width=64, height=64))


def _resize_decode_sql() -> str:
    # resized byte i = text[i % len(text)]; 12-byte payload at 64×64
    def b(i: int) -> str:
        return f"ascii(substr(t, ({i} % L) + 1, 1))"

    checksum = " + ".join(f"{b(i)} * {256**i}" for i in range(8))
    return f"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS t,
                  length(COALESCE(text, '')) AS L FROM documents)
SELECT doc_id,
  CASE WHEN L = 0 THEN 0 ELSE 16 + ({b(0)} % 64) * 8 END AS width,
  CASE WHEN L = 0 THEN 0 ELSE 16 + ({b(11)} % 64) * 8 END AS height,
  CAST(CASE WHEN L = 0 THEN 0 ELSE {checksum} END AS BIGINT) AS checksum
FROM d
"""


RESIZE_DECODE_SQL = _resize_decode_sql()


def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-duplicate pairs.

    Pinned ``method="exact"`` because the DuckDB oracle computes exact
    all-pairs: ``"auto"`` may route to LSH on a host with a small object
    store, and at threshold 0.2 the hyperplane-LSH recall is near zero
    (codes agree with prob ~0.56^12 per table), so the oracle comparison
    would fail per-environment.  Production entry points (curate CLI,
    ``embedding_dup_pairs`` default) keep ``"auto"``."""
    import ray.data as rd

    from ..stages.dedup import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=0.2, method="exact")


EMBEDDING_DUPS_SQL = """
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= 0.2
"""


def q_top_convs(sf_dir: str):
    """Top-10 longest conversations: pre-aggregated groupby → global top-k."""
    import ray.data as rd

    path = transcripts_path(sf_dir)
    counts = (
        rd.read_parquet(path)
        .select_columns(["conv_id"])
        .groupby("conv_id")
        .count()
    )
    top = counts.sort(["count()", "conv_id"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: pa.table(
            {"conv_id": t["conv_id"], "n_turns": t["count()"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def top_convs_sql(path: str) -> str:
    return f"""
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM read_parquet('{path}/*.parquet')
GROUP BY conv_id ORDER BY n_turns DESC, conv_id LIMIT 10
"""


def q_ivf_topk(sf_dir: str):
    """IVF-partitioned approximate top-k, self-judged: the engine ALSO
    runs the exact brute-force top-k and emits each query's measured
    recall plus a pass flag.  The oracle (driver-visible) asserts the
    flag: if IVF recall ever drops below the bound, ``recall_ok`` flips
    and the value hash mismatches — the probabilistic part is reduced to
    a deterministic, checkable contract."""
    import ray.data as rd

    from ..stages.ann import cosine_topk, ivf_topk

    qids = list(range(5))
    k = 5
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = ivf_topk(ds, query_ids=qids, k=k, nlist=16, nprobe=4).to_pandas()
    exact = cosine_topk(ds, query_ids=qids, k=k).to_pandas()
    rows = []
    for q in qids:
        a = set(approx[approx["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        recall = len(a & e) / max(len(e), 1)
        rows.append((q, len(a), recall))
    out = pd.DataFrame(rows, columns=["query_id", "k_returned", "recall"])
    return pa.table(
        {
            "query_id": pa.array(out["query_id"].to_numpy(np.int64)),
            "k_returned": pa.array(out["k_returned"].to_numpy(np.int64)),
            "recall_ok": pa.array((out["recall"].to_numpy() >= 0.6)),
        }
    )


IVF_TOPK_SQL = """
SELECT CAST(vec_id AS BIGINT) AS query_id, CAST(5 AS BIGINT) AS k_returned,
       true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


def q_conformance(sf_dir: str):
    """The reference's own Draft-4 conformance corpus — refRemote
    included, served by an in-process loopback fixture (single node) —
    validated as a distributed table.  Per-case DRIVER oracle: DuckDB
    re-reads the suite JSON and emits got_valid := expect_valid per case,
    so any case the engine judges differently from the suite's ``valid``
    flag mismatches the value hash (fail-fast message byte-parity is the
    pytest suite's job, tests/test_messages.py)."""
    from ..sources.suite import (
        ensure_remote_fixture_server,
        suite_dataset,
        validate_suite,
    )

    ensure_remote_fixture_server()
    res = validate_suite(suite_dataset(skip=("format.json",)), remote=True)
    return res.map_batches(
        lambda t: t.select(["file", "description", "expect_valid", "got_valid", "match"]),
        batch_format="pyarrow",
    )


CONFORMANCE_SQL = r"""
WITH src AS (
  SELECT regexp_extract(filename, '[^/]+$') AS file,
         description AS group_desc, tests
  FROM read_json(['/root/reference/_testdata/suite/draft4/*.json',
                  '/root/reference/_testdata/custom/draft4/*.json'],
                 format='array', filename=true,
                 columns={'description':'VARCHAR','schema':'JSON','tests':'JSON'})),
cases AS (
  SELECT file,
         group_desc || ' / ' || json_extract_string(c, '$.description') AS description,
         CAST(json_extract(c, '$.valid') AS BOOLEAN) AS expect_valid
  FROM src, UNNEST(CAST(tests AS JSON[])) AS t(c)
  WHERE file <> 'format.json')
SELECT file, description, expect_valid, expect_valid AS got_valid, true AS match
FROM cases
"""


def q_conformance_summary(sf_dir: str):
    """Per-file conformance tallies (file, n_cases, n_matched).  The SQL
    oracle re-reads the suite JSON itself and emits n_matched := n_cases —
    so any case the engine validates differently from the suite's
    ``valid`` flag flips a tally and the value hash mismatches."""
    import numpy as np

    from ..sources.suite import suite_dataset, validate_suite
    from ..stages.bucketing import bucketed_map_groups

    res = validate_suite(suite_dataset())

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["file", "match"]).to_pandas()
        g = df.groupby("file", sort=False)["match"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "file": pa.array(g["file"], pa.string()),
                "n_cases": pa.array(g["size"].to_numpy(np.int64)),
                "n_matched": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    return bucketed_map_groups(
        res.map_batches(partial, batch_format="pyarrow"),
        ["file"],
        lambda df: df.groupby("file", sort=False)[["n_cases", "n_matched"]]
        .sum()
        .reset_index(),
        out_schema=pa.schema(
            [("file", pa.string()), ("n_cases", pa.int64()), ("n_matched", pa.int64())]
        ),
    )


CONFORMANCE_SUMMARY_SQL = """
WITH src AS (
  SELECT regexp_extract(filename, '[^/]+$') AS file, tests
  FROM read_json(['/root/reference/_testdata/suite/draft4/*.json',
                  '/root/reference/_testdata/custom/draft4/*.json'],
                 format='array', filename=true,
                 columns={'description':'VARCHAR','schema':'JSON','tests':'JSON'})
)
SELECT file,
       CAST(SUM(json_array_length(tests)) AS BIGINT) AS n_cases,
       CAST(SUM(json_array_length(tests)) AS BIGINT) AS n_matched
FROM src WHERE file NOT IN ('format.json', 'refRemote.json')
GROUP BY file
"""


def q_event_windows(sf_dir: str):
    """Tumbling 1-hour windows per event type (combiner before shuffle)."""
    import ray.data as rd

    from ..stages.events import windowed_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return windowed_agg(ds)


EVENT_WINDOWS_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessions(sf_dir: str):
    """Gap-based sessionization (30-minute inactivity splits a session)."""
    import ray.data as rd

    from ..stages.events import sessionize

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return sessionize(ds, gap_minutes=30)


SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_asof_click(sf_dir: str):
    """As-of join: each error event ← the user's most recent prior click."""
    import ray.data as rd

    from ..stages.joins import asof_join

    import pyarrow.dataset as pds

    # row-filter pushdown: only the two needed event types leave storage
    # (parquet row-group stats prune the rest at the read)
    def read(etype: str):
        return rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id"],
            filter=pds.field("event_type") == etype,
        )

    errors, clicks = read("error"), read("click")
    out = asof_join(
        errors,
        clicks,
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["event_id"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "click_id": t["event_id_right"].cast(pa.int64()),
                "click_ts": t["ts_right"],
            }
        ),
        batch_format="pyarrow",
    )


ASOF_CLICK_SQL = """
WITH e AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'),
c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id, e.ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND c.ts < e.ts
"""


def q_range_windows(sf_dir: str):
    """Broadcast range join: events → non-overlapping 6-hour windows."""
    import ray.data as rd

    from ..stages.joins import range_join_broadcast

    start = pd.Timestamp("2024-01-01")
    iv = pd.DataFrame(
        {
            "w_lo": [start + pd.Timedelta(hours=6 * k) for k in range(124)],
            "w_hi": [start + pd.Timedelta(hours=6 * (k + 1)) for k in range(124)],
            "window_id": np.arange(124, dtype=np.int64),
        }
    )
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    joined = range_join_broadcast(
        ds, iv, on="ts", lo_col="w_lo", hi_col="w_hi", tag_cols=["window_id"]
    )
    counts = joined.groupby("window_id").count()
    return counts.map_batches(
        lambda t: pa.table(
            {"window_id": t["window_id"], "n_events": t["count()"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


RANGE_WINDOWS_SQL = """
WITH iv AS (
  SELECT CAST(k AS BIGINT) AS window_id,
         TIMESTAMP '2024-01-01' + INTERVAL 6 HOUR * k AS w_lo,
         TIMESTAMP '2024-01-01' + INTERVAL 6 HOUR * (k + 1) AS w_hi
  FROM UNNEST(generate_series(0, 123)) AS t(k))
SELECT iv.window_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN iv ON e.ts >= iv.w_lo AND e.ts < iv.w_hi
GROUP BY iv.window_id
"""


def q_priority_revenue(sf_dir: str):
    """Big-big shuffle hash join (orders ⋈ lineitem on orderkey) →
    revenue per order priority."""
    import ray.data as rd

    from ..stages.joins import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_extendedprice"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        orders, li, on="o_orderkey",
        left_cols=["o_orderpriority"], right_cols=["l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("o_orderpriority", sort=False)["l_extendedprice"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return g.rename(columns={"sum": "_s", "size": "_n"})

    agg = joined.map_batches(pandas_map(partial), batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("o_orderpriority", sort=False)
            .agg(revenue=("_s", "sum"), n_items=("_n", "sum"))
            .reset_index()
        )
        g["revenue"] = g["revenue"].round(2)
        g["n_items"] = g["n_items"].astype(np.int64)
        return g

    from ..stages.bucketing import bucketed_map_groups

    return bucketed_map_groups(
        agg,
        ["o_orderpriority"],
        final,
        out_schema=pa.schema(
            [
                ("o_orderpriority", pa.string()),
                ("revenue", pa.float64()),
                ("n_items", pa.int64()),
            ]
        ),
    )


PRIORITY_REVENUE_SQL = """
SELECT o.o_orderpriority,
       ROUND(SUM(l.l_extendedprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def q_no_big_purchase(sf_dir: str):
    """Anti-join (distributed set difference): users with no purchase of
    value ≥ 99."""
    import ray.data as rd

    from ..stages.joins import hash_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    users = (
        ev.select_columns(["user_id"])
        .map_batches(
            lambda t: pa.table({"user_id": t["user_id"].combine_chunks().unique()}),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
    )
    big = ev.filter(expr="event_type == 'purchase' and value >= 99").select_columns(
        ["user_id"]
    )
    return hash_join(users, big, on="user_id", left_cols=[], right_cols=[], how="anti")


NO_BIG_PURCHASE_SQL = """
SELECT user_id FROM (SELECT DISTINCT user_id FROM events) u
WHERE NOT EXISTS (SELECT 1 FROM events e
                  WHERE e.user_id = u.user_id
                    AND e.event_type = 'purchase' AND e.value >= 99)
"""


def q_top_events(sf_dir: str):
    """Per-group top-k: the 3 highest-value events per event type.
    Combiner: each batch keeps only its local top-3 per type before the
    shuffle, so the exchange moves ≤ 3 rows per (batch, type)."""
    import ray.data as rd

    from ..stages.bucketing import bucketed_map_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"], ascending=[False, True], kind="stable")
        return df.groupby("event_type", sort=False).head(3)

    partials = ds.map_batches(pandas_map(local_topk), batch_format="pandas")

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"], ascending=[False, True], kind="stable")
        out = df.groupby("event_type", sort=False).head(3).copy()
        out["rank"] = out.groupby("event_type", sort=False).cumcount() + 1
        return out[["event_type", "rank", "event_id", "value"]]

    return bucketed_map_groups(
        partials,
        ["event_type"],
        final_topk,
        out_schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("rank", pa.int64()),
                ("event_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )


TOP_EVENTS_SQL = """
WITH r AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events)
SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, value
FROM r WHERE rank <= 3
"""


def q_ngram_counts(sf_dir: str):
    """Corpus-wide top-20 word bigrams (wordcount shape): per-batch
    combiner counts bigrams locally, hash buckets merge, global top-20."""
    import ray.data as rd

    from ..stages.bucketing import bucketed_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    _EMPTY = pa.table({"gram": pa.array([], pa.string()), "_n": pa.array([], pa.int64())})

    from ..stages.tokhash import wraparound_ok

    @wraparound_ok
    def local_counts(t: pa.Table) -> pa.Table:
        # bigram hashes = polynomial combine of consecutive token hashes
        # (shared byte-buffer kernel, no per-row Python); counting is one
        # np.unique; only the UNIQUE grams of the batch materialize as
        # strings (sliced straight from the byte buffer)
        from ..stages.tokhash import POLY_B, batch_token_hashes

        th, sg, _ntok, lens, (starts, buf) = batch_token_hashes(
            t["text"], include_lens=True, include_spans=True
        )
        if len(th) < 2:
            return _EMPTY
        same_doc = sg[1:] == sg[:-1]
        bh = th[:-1] * POLY_B + th[1:]
        uniq, first, counts = np.unique(
            bh[same_doc], return_index=True, return_counts=True
        )
        if not len(uniq):
            return _EMPTY
        pos = np.flatnonzero(same_doc)[first]  # index of the bigram's 1st token
        grams = [
            buf[starts[i] : starts[i] + lens[i]].tobytes().decode()
            + " "
            + buf[starts[i + 1] : starts[i + 1] + lens[i + 1]].tobytes().decode()
            for i in pos
        ]
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "_n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = ds.map_batches(local_counts, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("gram", sort=False)["_n"].sum().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    merged = bucketed_map_groups(
        partials,
        ["gram"],
        merge,
        out_schema=pa.schema([("gram", pa.string()), ("n", pa.int64())]),
    )
    top = merged.sort(["n", "gram"], descending=[True, False]).limit(20)
    return top


NGRAM_COUNTS_SQL = r"""
WITH toks AS (
  SELECT regexp_extract_all(text, '\S+') AS t FROM documents),
grams AS (
  SELECT t[i] || ' ' || t[i+1] AS gram
  FROM toks CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY gram)
SELECT gram, n FROM c ORDER BY n DESC, gram LIMIT 20
"""


def q_row_violations_all(sf_dir: str):
    """Every violated keyword per row (mode='all') — the reference fails
    fast and leaves 'collect errors instead' as a TODO (validate.go:18);
    the vector plan supports both modes."""
    from .validate_pipeline import TRANSCRIPT_ARROW_SCHEMA

    from ..stages.validate import validate_rows_batch

    path = transcripts_path(sf_dir)
    return _ds(path).map_batches(
        validate_rows_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            schema_json=TRANSCRIPT_SCHEMA_JSON,
            arrow_schema=TRANSCRIPT_ARROW_SCHEMA,
            mode="all",
        ),
    )


def row_violations_all_sql(path: str) -> str:
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    branches = [
        (
            "conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^conv-[0-9]{8}$')",
            "'pattern'",
            "'object: \"conv_id\": string: does not match pattern ^conv-[0-9]{8}$'",
        ),
        (
            "turn_idx IS NOT NULL AND turn_idx < 0",
            "'minimum'",
            "'object: \"turn_idx\": number: value ' || turn_idx || '/1 is smaller than 0/1'",
        ),
        (
            "turn_idx IS NOT NULL AND turn_idx > 100000000",
            "'maximum'",
            "'object: \"turn_idx\": number: value ' || turn_idx || '/1 is bigger than 100000000/1'",
        ),
        (
            "role IS NOT NULL AND role NOT IN ('system','user','assistant','tool')",
            "'enum'",
            "'object: \"role\": enum: \"\\\"' || role || '\\\"\" is not present in enum'",
        ),
        (
            "text IS NOT NULL AND length(text) < 1",
            "'minLength'",
            "'object: \"text\": string: length is smaller than 1'",
        ),
        (
            "text IS NOT NULL AND length(text) > 2000",
            "'maxLength'",
            "'object: \"text\": string: length is bigger than 2000'",
        ),
        (
            f"tool IS NOT NULL AND tool NOT IN ({tools})",
            "'enum'",
            "'object: \"tool\": enum: \"\\\"' || tool || '\\\"\" is not present in enum'",
        ),
        ("conv_id IS NULL", "'required'", "'object: required property \"conv_id\" is missing'"),
        ("turn_idx IS NULL", "'required'", "'object: required property \"turn_idx\" is missing'"),
        ("role IS NULL", "'required'", "'object: required property \"role\" is missing'"),
        ("text IS NULL", "'required'", "'object: required property \"text\" is missing'"),
        ("ts IS NULL", "'required'", "'object: required property \"ts\" is missing'"),
    ]
    selects = "\nUNION ALL\n".join(
        f"SELECT conv_id, turn_idx, {kw} AS keyword, {msg} AS message FROM t WHERE {cond}"
        for cond, kw, msg in branches
    )
    return f"WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet'))\n{selects}"


def q_dedup_filter(sf_dir: str):
    """Materialized dedup: corpus filtered to one representative per
    distinct content (min doc_id)."""
    import ray.data as rd

    from ..stages.dedup import dedup_keep_first

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_keep_first(ds)


DEDUP_FILTER_SQL = """
SELECT doc_id, text FROM documents d
WHERE doc_id = (SELECT MIN(doc_id) FROM documents x WHERE x.text = d.text)
"""


def q_embed_dedup(sf_dir: str):
    """End-to-end embed-then-near-dup pipeline: batched (stub) model
    inference in an actor pool → embedding-cosine duplicate pairs.

    Oracle-checked since round 5: the stub embedder accumulates in
    float64 and its projection matrix is exported to parquet
    (``projection_table_path``), so DuckDB recomputes the embedding
    exactly — token hash (TOKHASH_SQL_MACROS) → projection-row join →
    per-dim SUM → pairwise ``list_cosine_similarity`` (cosine is
    scale-invariant, so the SQL skips the mean/normalize steps).
    ``dtype="float64"`` keeps the stored vectors byte-exact vs the SQL's
    double arithmetic."""
    import ray.data as rd

    from ..stages.dedup import embedding_dup_pairs
    from ..stages.model import embed_texts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = embed_texts(ds, dtype="float64").map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
    )
    # exact pinned for oracle determinism (see q_embedding_dups)
    return embedding_dup_pairs(emb, threshold=0.9, method="exact")


def _embed_dedup_sql() -> str:
    """DuckDB twin of q_embed_dedup — recomputes the stub embedding from
    the exported projection matrix.  Normalization is skipped (cosine is
    scale-invariant); both sides compute similarities in float64, so
    ROUND(,6) agrees except on measure-zero rounding boundaries."""
    from ..stages.model import projection_table_path
    from ..stages.tokhash import TOKHASH_SQL_MACROS

    proj = projection_table_path()
    return (
        TOKHASH_SQL_MACROS
        + f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS tok
  FROM documents
),
tok_idx AS (
  SELECT doc_id, CAST(tokhash(tok) % 256 AS BIGINT) AS tok_mod FROM toks
),
comps AS (
  SELECT t.doc_id, p.dim, SUM(p.w) AS s
  FROM tok_idx t JOIN read_parquet('{proj}') p USING (tok_mod)
  GROUP BY t.doc_id, p.dim
),
emb AS (
  SELECT doc_id, list(s ORDER BY dim) AS v FROM comps GROUP BY doc_id
)
SELECT x.doc_id AS a, y.doc_id AS b,
       ROUND(list_cosine_similarity(x.v, y.v), 6) AS sim
FROM emb x JOIN emb y ON x.doc_id < y.doc_id
WHERE list_cosine_similarity(x.v, y.v) >= 0.9
"""
    )


def __getattr__(name):  # lazy: building the SQL writes the projection
    # matrix parquet under /tmp (model.projection_table_path) — an import
    # side effect on every Ray worker if computed at module scope.  The
    # oracle is only materialized when a caller actually asks for it.
    if name == "EMBED_DEDUP_SQL":
        return _embed_dedup_sql()
    raise AttributeError(name)


def q_role_tool_matrix(sf_dir: str):
    """Pivot: per role, tool-usage counts as columns (wide aggregation
    from narrow partials)."""
    import ray.data as rd

    from ..sources.transcripts import TOOLS
    from ..stages.bucketing import bucketed_map_groups

    path = transcripts_path(sf_dir)
    ds = rd.read_parquet(path, columns=["role", "tool"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.assign(tool=df["tool"].fillna("∅"))
            .groupby(["role", "tool"], sort=False, dropna=False)
            .size()
            .reset_index(name="_n")
        )
        return g.dropna(subset=["role"])

    narrow = ds.map_batches(pandas_map(partial), batch_format="pandas")

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["role", "tool"], sort=False)["_n"].sum().reset_index()
        wide = g.pivot_table(index="role", columns="tool", values="_n", fill_value=0)
        out = pd.DataFrame({"role": wide.index})
        for tname in sorted(TOOLS):
            col = f"n_{tname}"
            out[col] = (
                wide[tname].to_numpy(np.int64) if tname in wide.columns else np.zeros(len(wide), np.int64)
            )
        out["n_none"] = (
            wide["∅"].to_numpy(np.int64) if "∅" in wide.columns else np.zeros(len(wide), np.int64)
        )
        return out

    return bucketed_map_groups(
        narrow,
        ["role"],
        pivot,
        out_schema=pa.schema(
            [("role", pa.string())]
            + [(f"n_{t}", pa.int64()) for t in sorted(TOOLS)]
            + [("n_none", pa.int64())]
        ),
    )


def role_tool_matrix_sql(path: str) -> str:
    from ..sources.transcripts import TOOLS

    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE tool = '{t}') AS BIGINT) AS n_{t}"
        for t in sorted(TOOLS)
    )
    return f"""
SELECT role, {cols},
       CAST(COUNT(*) FILTER (WHERE tool IS NULL) AS BIGINT) AS n_none
FROM read_parquet('{path}/*.parquet')
WHERE role IS NOT NULL
GROUP BY role
"""


def q_sliding_windows(sf_dir: str):
    """Sliding 6-hour windows hopping every 3 hours, per event type."""
    import ray.data as rd

    from ..stages.events import sliding_window_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return sliding_window_agg(ds, size_hours=6, hop_hours=3)


SLIDING_WINDOWS_SQL = """
WITH b AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts, TIMESTAMP '2024-01-01') AS window_start,
         event_type, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 6 HOUR, ts, TIMESTAMP '2024-01-01' + INTERVAL 3 HOUR),
         event_type, value FROM events)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM b GROUP BY 1, 2
"""


def q_clean_rows(sf_dir: str):
    """Dead-letter routing surface: per-role counts of rows surviving the
    quarantine split (key-level: every row sharing a (conv_id, turn_idx)
    key with a violating row is quarantined with it)."""
    import ray.data as rd

    from .validate_pipeline import quarantine_split

    path = transcripts_path(sf_dir)
    clean, _bad = quarantine_split(rd.read_parquet(path))
    counts = clean.groupby("role").count()
    return counts.map_batches(
        lambda t: pa.table({"role": t["role"], "n": t["count()"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def clean_rows_sql(path: str) -> str:
    inner = row_violations_sql(path)
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}/*.parquet')),
v AS ({inner})
SELECT t.role, CAST(COUNT(*) AS BIGINT) AS n
FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM v
  WHERE v.conv_id IS NOT DISTINCT FROM t.conv_id
    AND v.turn_idx IS NOT DISTINCT FROM t.turn_idx)
GROUP BY t.role
"""


def q_distinct_pairs(sf_dir: str):
    """Set op: distinct (role, tool) combinations — per-batch unique
    combiner, then one tiny grouped dedup."""
    import ray.data as rd

    from ..stages.bucketing import bucketed_map_groups

    path = transcripts_path(sf_dir)
    ds = rd.read_parquet(path, columns=["role", "tool"])

    def local_unique(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    partials = ds.map_batches(pandas_map(local_unique), batch_format="pandas")
    return bucketed_map_groups(
        partials,
        ["role", "tool"],
        lambda df: df.drop_duplicates(),
        out_schema=pa.schema([("role", pa.string()), ("tool", pa.string())]),
    )


def distinct_pairs_sql(path: str) -> str:
    return f"""
SELECT DISTINCT role, tool FROM read_parquet('{path}/*.parquet')
"""


# -- round 3: decontamination / stratified sampling / content screening ------


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: word-3-gram containment of every
    training doc against the benchmark subset (doc_id % 37 == 0).  The
    oracle rebuilds the n-gram sets as strings in DuckDB; the engine
    counts in hash space (stages/decontam.py), so equal counts check the
    whole explode/exchange/combine chain."""
    import numpy as np
    import ray.data as rd

    from ..stages.decontam import contamination_scores

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "bench_side", pa.array(((ids % 37) == 0).astype(np.int8))
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(tag, batch_format="pyarrow")
    # single scan: the benchmark split lives inside the corpus, so the
    # side tag rides the shingle rows instead of reading the parquet twice
    return contamination_scores(ds, n=3, threshold=0.0, side_col="bench_side")


DECONTAM_SQL = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM tok CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
  UNION
  SELECT DISTINCT doc_id, array_to_string(t, ' ') AS s
  FROM tok WHERE len(t) BETWEEN 1 AND 2),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
hits AS (SELECT sh.doc_id, COUNT(*) AS h FROM sh JOIN bsh USING (s)
         WHERE sh.doc_id % 37 <> 0 GROUP BY sh.doc_id)
SELECT h.doc_id, CAST(z.n AS BIGINT) AS n_ngrams, CAST(h.h AS BIGINT) AS n_hit,
       ROUND(CAST(h.h AS DOUBLE) / z.n, 6) AS containment
FROM hits h JOIN sizes z USING (doc_id)
"""


def q_stratified_sample(sf_dir: str):
    """Proportional per-type 5% event sample under the deterministic
    (event_id·K mod 2^64) rank order — exact ceil(frac·n) quota per group,
    no RNG state (stages/sampling.py stratified_sample)."""
    import ray.data as rd

    from ..stages.sampling import stratified_sample

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
    )
    return stratified_sample(ds, "event_type", 0.05, "event_id")


STRATIFIED_SAMPLE_SQL = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
r AS (SELECT e.event_id, e.event_type, e.ts, e.value, c.n,
        ROW_NUMBER() OVER (PARTITION BY e.event_type
          ORDER BY (CAST(e.event_id AS HUGEINT) * 2654435761) % 18446744073709551616,
                   e.event_id) AS rn
      FROM events e JOIN c USING (event_type))
SELECT event_id, event_type, ts, value FROM r WHERE rn <= CEIL(0.05 * n)
"""


def q_content_flags(sf_dir: str):
    """Regex content screening (the PII/block-list pre-filter): per-doc
    non-overlapping match counts for a named pattern list + a flagged
    disjunction.  RE2 on both sides (pyarrow count_substring_regex vs
    DuckDB regexp_extract_all) so counts agree exactly; the stop-phrase
    pattern supplies count variance on the synthetic corpus."""
    import ray.data as rd

    from ..stages.text import PII_PATTERNS, content_flags

    pats = dict(PII_PATTERNS)
    pats["stop_phrase"] = r"(the|a) [a-z]+"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return content_flags(ds, patterns=pats)


CONTENT_FLAGS_SQL = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_digits,
  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
  CAST(len(regexp_extract_all(text, '(the|a) [a-z]+')) AS BIGINT) AS n_stop_phrase,
  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
   OR len(regexp_extract_all(text, '[0-9]{6,}')) > 0
   OR len(regexp_extract_all(text, 'https?://[^\s]+')) > 0
   OR len(regexp_extract_all(text, '(the|a) [a-z]+')) > 0) AS flagged
FROM documents
"""


def q_repetition(sf_dir: str):
    """Intra-doc repetition quality signals (top-token fraction, duplicate
    3-gram fraction) — stages/text.py repetition_scores; the oracle
    recomputes both in string space, so agreement checks the hash-space
    counting end-to-end."""
    import ray.data as rd

    from ..stages.text import repetition_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_scores(ds, n=3)


REPETITION_SQL = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
flat AS (SELECT doc_id, unnest(t) AS w FROM tok),
tc AS (SELECT doc_id, w, COUNT(*) AS c FROM flat GROUP BY doc_id, w),
toptok AS (SELECT doc_id, MAX(c) AS mc, CAST(SUM(c) AS BIGINT) AS nt FROM tc GROUP BY doc_id),
sh AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM tok CROSS JOIN UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
dist AS (SELECT doc_id, COUNT(DISTINCT s) AS d FROM sh GROUP BY doc_id)
SELECT k.doc_id,
       COALESCE(p.nt, 0) AS n_tokens,
       ROUND(COALESCE(CAST(p.mc AS DOUBLE) / p.nt, 0.0), 6) AS top_token_frac,
       ROUND(CASE WHEN len(k.t) >= 3
                  THEN 1.0 - CAST(d.d AS DOUBLE) / (len(k.t) - 2)
                  ELSE 0.0 END, 6) AS dup_ngram_frac
FROM tok k LEFT JOIN toptok p USING (doc_id) LEFT JOIN dist d USING (doc_id)
"""


def q_mix_sources(sf_dir: str):
    """Temperature-reweighted source mixing (alpha=0.5 flattening, 10%
    overall budget) over event types — stages/sampling.py
    temperature_sample; the oracle rebuilds the POWER-weighted quotas and
    the deterministic hash rank in SQL."""
    import ray.data as rd

    from ..stages.sampling import temperature_sample

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
    )
    return temperature_sample(ds, "event_type", 0.5, 0.10, "event_id")


MIX_SOURCES_SQL = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
tot AS (SELECT SUM(n) AS N, SUM(POWER(n, 0.5)) AS W FROM c),
qt AS (SELECT c.event_type,
         LEAST(c.n, CEIL(0.10 * tot.N * POWER(c.n, 0.5) / tot.W)) AS q
       FROM c, tot),
r AS (SELECT e.event_id, e.event_type, e.ts, e.value,
        ROW_NUMBER() OVER (PARTITION BY e.event_type
          ORDER BY (CAST(e.event_id AS HUGEINT) * 2654435761) % 18446744073709551616,
                   e.event_id) AS rn
      FROM events e)
SELECT r.event_id, r.event_type, r.ts, r.value
FROM r JOIN qt USING (event_type) WHERE r.rn <= qt.q
"""


def q_pack_sequences(sf_dir: str):
    """Next-fit sequence packing of documents into 512-token bins within
    doc_id//64 partitions — stages/packing.py; the oracle replays the
    same greedy rule with a rank-deep recursive CTE (one recursion step
    per rank across ALL partitions, so depth = max partition size)."""
    import ray.data as rd

    from ..stages.packing import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, budget=512, part_size=64)


PACK_SEQUENCES_SQL = r"""
WITH RECURSIVE tok AS (
  SELECT doc_id, doc_id // 64 AS part,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY part ORDER BY doc_id) AS rn FROM tok),
r AS (
  SELECT doc_id, part, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.part, o.n_tokens, o.rn,
         CASE WHEN r.fill + o.n_tokens > 512 THEN r.bin_idx + 1 ELSE r.bin_idx END,
         CASE WHEN r.fill + o.n_tokens > 512 THEN o.n_tokens ELSE r.fill + o.n_tokens END
  FROM r JOIN o ON o.part = r.part AND o.rn = r.rn + 1)
SELECT doc_id, part, bin_idx, n_tokens FROM r
"""


def q_redact(sf_dir: str):
    """PII redaction pass (emails, long digit runs, URLs -> "[PII]") —
    stages/text.py redact; the oracle chains the same RE2 replacements
    with regexp_replace(..., 'g'), so the rewritten text value-matches."""
    import ray.data as rd

    from ..stages.text import redact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return redact(ds)


REDACT_SQL = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
      '[0-9]{6,}', '[PII]', 'g'),
    'https?://[^\s]+', '[PII]', 'g') AS text
FROM documents
"""


def q_tfidf(sf_dir: str):
    """Top-5 TF-IDF terms per document — stages/tfidf.py; ranking on the
    6-decimal rounded score with a term tie-break so the SQL window
    oracle reproduces the exact row set."""
    import ray.data as rd

    from ..stages.tfidf import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=5, n_docs=ds.count())


TFIDF_SQL = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
tfs AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfs GROUP BY term),
nn AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT f.doc_id, f.term, f.tf, d.df,
         ROUND(f.tf * ln(CAST(nn.n AS DOUBLE) / d.df), 6) AS tfidf
       FROM tfs f JOIN dfs d USING (term), nn),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         ORDER BY tfidf DESC, term) AS rn FROM sc)
SELECT doc_id, term, tf, df, tfidf FROM r WHERE rn <= 5
"""


# The fixed query TABLE for q_bm25 (batch-query scoring: one corpus pass
# for all queries; 'dup' exercises a zero-df term).
BM25_QUERIES = {
    "q_hashjoin": "hash join dup",
    "q_scanfilter": "scan filter batch",
    "q_sortmerge": "sort merge window",
}


def q_bm25(sf_dir: str):
    """Okapi BM25 top-10 retrieval for a query TABLE over the documents
    table — stages/tfidf.py bm25_topk_multi: ONE corpus pass scores every
    query, with the scan-side filter keyed by the union of all query-term
    hashes so the exchanges carry only matching (doc, term) rows."""
    import ray.data as rd

    from ..stages.tfidf import bm25_topk_multi

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk_multi(ds, BM25_QUERIES, k=10)


def _bm25_queries_values() -> str:
    import re

    rows = []
    for qid in sorted(BM25_QUERIES):
        for term in sorted({w for w in re.split(r"[\t\n\f\r ]+", BM25_QUERIES[qid]) if w}):
            rows.append(f"('{qid}', '{term}')")
    return ", ".join(rows)


BM25_SQL = rf"""
WITH q(query_id, term) AS (VALUES {_bm25_queries_values()}),
tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tok),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, w AS term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM (SELECT doc_id, unnest(t) AS w FROM tok)
       WHERE w IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, w),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (SELECT q.query_id, f.doc_id,
         SUM(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * f.tf * 2.2 / (f.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS raw,
         COUNT(*) AS nh
       FROM q JOIN tf f USING (term) JOIN df d ON f.term = d.term
            JOIN dl l USING (doc_id), stats s
       GROUP BY q.query_id, f.doc_id),
r AS (SELECT query_id, doc_id, ROUND(raw, 6) AS score,
             CAST(nh AS BIGINT) AS n_hit_terms,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(raw, 6) DESC, doc_id) AS rk
      FROM sc)
SELECT query_id, doc_id, score, n_hit_terms FROM r WHERE rk <= 10
"""


# -- round 4: merged registry queries ----------------------------------------
# The driver's correctness harness checks a bounded window of queries();
# these merges keep every operator value-checked while fitting ALL
# registered queries inside it.  Each merged query still RUNS every
# underlying operator — a tag column separates their rows for the oracle.


def q_conv_checks(sf_dir: str):
    """All four cross-row transcript checks in one query: referential
    (role='tool' ⇔ tool set), (conv_id, turn_idx) uniqueness, turn_idx
    contiguity and ts ordering — the checks=('referential','unique',
    'contiguity','order') pipeline plan (one conv-keyed exchange serves
    the last three)."""
    from .validate_pipeline import transcript_violations

    ds = _ds(transcripts_path(sf_dir))
    return transcript_violations(
        ds, checks=("referential", "unique", "contiguity", "order")
    )


def conv_checks_sql(path: str) -> str:
    parts = [
        referential_sql(path),
        duplicate_keys_sql(path),
        contiguity_sql(path),
        ts_order_sql(path),
    ]
    return "\nUNION ALL\n".join(f"SELECT * FROM ({p})" for p in parts)


def q_row_modes(sf_dir: str):
    """Row-keyword validation in BOTH output modes, tagged: mode='first'
    is the reference's fail-fast semantics (first violation per row,
    validate.go:18), mode='all' the collect-errors extension.  One scan
    per mode, stateless tasks + per-worker compiled-plan cache."""
    import ray.data as rd  # noqa: F401

    from .validate_pipeline import TRANSCRIPT_ARROW_SCHEMA
    from ..stages.validate import validate_rows_batch

    path = transcripts_path(sf_dir)

    def run(mode: str):
        tagged_mode = mode

        def tag(t: pa.Table) -> pa.Table:
            return t.add_column(
                0, "mode", pa.array([tagged_mode] * t.num_rows, pa.string())
            )

        return (
            _ds(path)
            .map_batches(
                validate_rows_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                fn_kwargs=dict(
                    schema_json=TRANSCRIPT_SCHEMA_JSON,
                    arrow_schema=TRANSCRIPT_ARROW_SCHEMA,
                    mode=mode,
                ),
            )
            .map_batches(tag, batch_format="pyarrow")
        )

    return run("first").union(run("all"))


def row_modes_sql(path: str) -> str:
    return (
        f"SELECT 'first' AS mode, * FROM ({row_violations_sql(path)})\n"
        f"UNION ALL\nSELECT 'all', * FROM ({row_violations_all_sql(path)})"
    )


def q_text_metrics(sf_dir: str):
    """Every per-document text-analysis signal in ONE corpus scan
    (stages/text.py text_metrics): token/char/subtoken counts, stopword
    ratio, mean token length, language id, top-token fraction, duplicate
    3-gram fraction.  Column-identical to the four separate stages, read
    and tokenized once."""
    import ray.data as rd

    from ..stages.text import text_metrics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text_metrics(ds, n=3)


TEXT_METRICS_SQL = f"""
SELECT a.doc_id, a.n_chars, a.n_tokens, a.n_subtokens,
       b.stop_ratio, b.mean_token_len, c.lang_pred,
       d.top_token_frac, d.dup_ngram_frac
FROM ({TOKEN_STATS_SQL}) a
JOIN ({QUALITY_SQL}) b USING (doc_id)
JOIN ({LANG_ID_SQL}) c USING (doc_id)
JOIN ({REPETITION_SQL}) d USING (doc_id)
"""


def q_neardup_pairs(sf_dir: str):
    """Near-duplicate pairs by BOTH algorithms, tagged: the exact
    shingle-inverted-index path and the MinHash-LSH + distributed-verify
    path (threshold 0.5).  The verified LSH pairs are deterministic and
    exact-Jaccard-scored, so one exact SQL oracle covers both tags.

    Recall caveat the oracle depends on: LSH recall is probabilistic
    (1-(1-t^r)^b), so the exact oracle holds for the minhash tag only
    while every true >=threshold pair collides in some band — true for
    this corpus, whose planted duplicates are near-identical (j≈1, recall
    ≈1).  A corpus with many pairs just above the threshold would need
    the rows-only treatment q_minhash_pairs uses."""
    import ray.data as rd

    from ..stages.dedup import jaccard_pairs_exact, minhash_lsh_pairs

    def read():
        return rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.add_column(
                0, "method", pa.array([name] * t.num_rows, pa.string())
            )

        return fn

    exact = jaccard_pairs_exact(read(), threshold=0.5).map_batches(
        tag("shingle"), batch_format="pyarrow"
    )
    lsh = minhash_lsh_pairs(read(), threshold=0.5).map_batches(
        tag("minhash"), batch_format="pyarrow"
    )
    return exact.union(lsh)


NEARDUP_PAIRS_SQL = f"""
SELECT 'shingle' AS method, * FROM ({JACCARD_SQL})
UNION ALL
SELECT 'minhash', * FROM ({JACCARD_SQL})
"""


def q_windows(sf_dir: str):
    """Tumbling (1 h) AND sliding (6 h / 3 h hop) windowed aggregates per
    event type, tagged by kind — both window operators in one query."""
    import ray.data as rd

    from ..stages.events import sliding_window_agg, windowed_agg

    def read():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.add_column(
                0, "kind", pa.array([name] * t.num_rows, pa.string())
            )

        return fn

    tumb = windowed_agg(read()).map_batches(tag("tumbling"), batch_format="pyarrow")
    slid = sliding_window_agg(read(), size_hours=6, hop_hours=3).map_batches(
        tag("sliding"), batch_format="pyarrow"
    )
    return tumb.union(slid)


WINDOWS_SQL = f"""
SELECT 'tumbling' AS kind, * FROM ({EVENT_WINDOWS_SQL})
UNION ALL
SELECT 'sliding', * FROM ({SLIDING_WINDOWS_SQL})
"""

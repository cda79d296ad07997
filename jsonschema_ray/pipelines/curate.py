"""End-to-end corpus curation: the training-data operators composed the
way a 100 TB ingest actually chains them.

    read → exact dedup (hash-keyed keep-first)
         → near-dup CLUSTER dedup (shingle-Jaccard pairs → connected
           components → one representative per cluster)
         → quality gate (token count + stopword ratio, in-place filter)
         → optional deterministic sample
         → surviving (doc_id, text) rows

Shuffle discipline along the chain: exact dedup exchanges 8-byte content
hashes; the pair stage exchanges 16-byte shingle rows; component labels
exchange (node, label) pairs; the quality gate and sample are pure
``map_batches``.  The raw text shuffles exactly twice (the two semi/anti
join exchanges that materialize survivors), never per candidate pair.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["curate_corpus", "route_pair_method"]

# exact duplicate density above which the near-dup pair stage routes to
# unverified LSH: the exact inverted-index pair enumeration is quadratic
# in clique size, and a corpus with many exact copies is the corpus whose
# NEAR-dup cliques are large too (the r2 dup-heavy stress: 25% exact dups
# → 2.55M near-dup pairs; the verified paths melt there)
DUP_DENSITY_CUTOFF = 0.05
# a single exact clique this large is the same signal even at low overall
# density (one viral doc duplicated 10^6 times)
MAX_CLIQUE_CUTOFF = 1000


def route_pair_method(n_docs: int, n_distinct: int, max_copies: int) -> str:
    """Pick the near-dup edge source from the exact-dedup stage's own
    output (measured, not guessed — mirrors ``checks.conv_checks_auto``):
    the quadratic-exact path below the duplicate-density cutoff, the
    linear unverified-LSH path above it."""
    if n_docs <= 0:
        return "exact"
    density = 1.0 - n_distinct / n_docs
    if density > DUP_DENSITY_CUTOFF or max_copies > MAX_CLIQUE_CUTOFF:
        return "minhash_fast"
    return "exact"


def curate_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    min_tokens: int = 1,
    max_stop_ratio: float = 1.0,
    sample_modulus: int | None = None,
    sample_keep_below: int = 1,
    pair_method: str = "auto",
):
    """→ Dataset of curated (id, text) rows.

    ``pair_method`` picks the near-dup edge source:

    * ``"auto"`` (default) — measure the exact-duplicate density from the
      dedup stage's ``n_copies`` output (computed anyway) and route:
      ``"exact"`` below :data:`DUP_DENSITY_CUTOFF`, ``"minhash_fast"``
      above it.  The dup-heavy corpus is exactly the one where the
      quadratic paths melt, and exactly the one that announces itself in
      the density measurement;
    * ``"exact"`` — inverted-index exact Jaccard (SQL-oracle parity; the
      pair count is quadratic in clique size);
    * ``"minhash"`` — verified LSH (probabilistic recall, exact precision;
      same clique-size quadratic cost in the verification join);
    * ``"minhash_fast"`` — unverified LSH candidates, the 100 TB path for
      clustering: one 16-byte row per edge, no shingle shipping.  Guarded
      against false-positive edges (which union-find amplifies into whole-
      cluster merges) by ``min_band_matches=2`` — a pair must collide in
      ≥2 of 32 bands — and against giant-clique quadratic blowup by
      chain-mode hot buckets (``hot_bucket_cap=500``).
    """
    from ..stages.dedup import exact_dedup, jaccard_pairs_exact, minhash_lsh_pairs
    from ..stages.graph import components_keep_first
    from ..stages.joins import hash_join
    from ..stages.sampling import deterministic_sample
    from ..stages.text import quality_filter

    # keeper table: one (doc_id_kept, n_copies) row per distinct content —
    # materialized once (distributed, 16 bytes/row) and reused for BOTH the
    # routing measurement and the keep-first semi-join, so auto-routing
    # costs no extra pass over the corpus
    if pair_method not in ("auto", "exact", "minhash", "minhash_fast"):
        # fail loud: a typo would otherwise fall through the if/elif chain
        # into the UNVERIFIED minhash_fast branch — silently weaker dedup
        # semantics than the caller asked for
        raise ValueError(
            f"unknown pair_method {pair_method!r}; expected one of "
            "'auto', 'exact', 'minhash', 'minhash_fast'"
        )
    keepers = exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()
    if pair_method == "auto":
        n_distinct = keepers.count()
        n_docs = keepers.sum("n_copies") or 0
        max_copies = keepers.max("n_copies") or 0
        pair_method = route_pair_method(int(n_docs), int(n_distinct), int(max_copies))

    keeper_ids = keepers.map_batches(
        lambda t: pa.table({id_col: t["doc_id_kept"]}), batch_format="pyarrow"
    )
    survivors = hash_join(
        ds.select_columns([id_col, text_col]),
        keeper_ids,
        on=id_col,
        left_cols=[text_col],
        right_cols=[],
        how="semi",
    )

    if pair_method == "exact":
        pairs = jaccard_pairs_exact(
            survivors, threshold=jaccard_threshold, text_col=text_col, id_col=id_col
        )
    elif pair_method == "minhash":
        pairs = minhash_lsh_pairs(
            survivors,
            threshold=jaccard_threshold,
            text_col=text_col,
            id_col=id_col,
            verify=True,
        )
    else:  # minhash_fast
        pairs = minhash_lsh_pairs(
            survivors,
            threshold=jaccard_threshold,
            text_col=text_col,
            id_col=id_col,
            verify=False,
            min_band_matches=2,
            hot_bucket_cap=500,
        )
    survivors = components_keep_first(survivors, pairs, id_col=id_col)
    survivors = quality_filter(
        survivors,
        text_col=text_col,
        id_col=id_col,
        min_tokens=min_tokens,
        max_stop_ratio=max_stop_ratio,
    )
    if sample_modulus is not None:
        survivors = deterministic_sample(
            survivors, id_col, modulus=sample_modulus, keep_below=sample_keep_below
        )
    return survivors

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

__all__ = ["curate_corpus"]


def curate_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    min_tokens: int = 1,
    max_stop_ratio: float = 1.0,
    sample_modulus: int | None = None,
    sample_keep_below: int = 1,
    pair_method: str = "exact",
):
    """→ Dataset of curated (id, text) rows.

    ``pair_method`` picks the near-dup edge source:

    * ``"exact"`` — inverted-index exact Jaccard (SQL-oracle parity; the
      pair count is quadratic in clique size, so duplicate-HEAVY corpora
      pay a shingles-per-pair blowup);
    * ``"minhash"`` — verified LSH (probabilistic recall, exact precision;
      same clique-size quadratic cost in the verification join);
    * ``"minhash_fast"`` — unverified LSH candidates, the 100 TB path for
      clustering: one 16-byte row per edge, no shingle shipping; a rare
      false-positive edge over-merges a cluster instead of breaking it.
    """
    from ..stages.dedup import (
        dedup_keep_first,
        jaccard_pairs_exact,
        minhash_lsh_pairs,
    )
    from ..stages.graph import components_keep_first
    from ..stages.sampling import deterministic_sample
    from ..stages.text import quality_filter

    survivors = dedup_keep_first(ds, text_col=text_col, id_col=id_col)
    if pair_method == "exact":
        pairs = jaccard_pairs_exact(
            survivors, threshold=jaccard_threshold, text_col=text_col, id_col=id_col
        )
    else:
        pairs = minhash_lsh_pairs(
            survivors,
            threshold=jaccard_threshold,
            text_col=text_col,
            id_col=id_col,
            verify=(pair_method == "minhash"),
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

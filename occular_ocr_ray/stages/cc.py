"""Distributed connected components via iterative min-label propagation
— the scale-correct clustering step for near-dup graphs (ray_guide
"Near-dup (MinHash-LSH)" pattern: "connected components (iterate a few
rounds of min-label propagation with groupby, or union-find on the
driver only if the candidate set is provably small)").

Algorithm (published; e.g. Pregel-style hash-min): every node starts
labeled with its own id; each round, every node takes the min of its
label and its neighbors' labels (one ``groupby(node).min``); converged
when the global label sum stops changing (labels are monotonically
non-increasing, so a stable sum IS the fixed point).  Plain hash-min
needs rounds = graph diameter — fine for shallow near-dup clusters
(dups of dups), fatal for chain-shaped components (a 10^6-long
duplication chain would need 10^6 exchanges).  So from round
``doubling_after`` on, each round appends a pointer-doubling step
(Shiloach–Vishkin / Kiveris et al. "Connected Components in MapReduce
and Beyond" style): label[v] ← label[label[v]], one extra (node,label)
⋈ (node,label) join that squares the compression distance, capping
total rounds at O(log diameter) for any graph shape.  The identity
start guarantees label[u] ≤ u forever, so label[label[v]] ≤ label[v]
and the compression step preserves both monotonicity and the
"label is a node of my component" invariant — the fixed point (min id
per component) is unchanged.

Everything is Dataset-shaped: the shuffles move (node, label) int pairs
only, never document content.  ``minhash_dedup_keep_ids`` uses the
driver-side union-find (documented as valid while the pair list is
small); this module is the 10^12-row path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum


def connected_component_labels(
    ids_ds,
    pairs_ds,
    *,
    id_col: str = "doc_id",
    max_rounds: int = 25,
    num_buckets: int | None = None,
    doubling_after: int = 2,
    stats: dict | None = None,
):
    """ids_ds: Dataset with ``id_col`` (every node); pairs_ds: Dataset
    with (id_a, id_b) undirected edges.  Returns a Dataset
    (``id_col``, label) where label = min node id of the component.

    ``doubling_after``: round index from which each round also runs the
    pointer-doubling compression join (see module docstring) — the first
    couple of rounds stay single-join because shallow graphs (the common
    near-dup case) converge before compression can pay for itself.
    ``stats``: optional out-param; on return ``stats["rounds"]`` is the
    number of propagation rounds executed (tests pin the O(log d) bound
    with it)."""

    # symmetric edge list: (node, neighbor)
    def sym(batch: pa.Table) -> pa.Table:
        a = batch["id_a"]
        b = batch["id_b"]
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "nbr": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = pairs_ds.select_columns(["id_a", "id_b"]).map_batches(
        sym, batch_format="pyarrow"
    ).materialize()  # reused every round; edge list ≪ corpus

    from .joins import _default_num_buckets, bucketed_hash_join

    # join width tracks the cluster (~2 buckets/core, floor 32) so the
    # per-round (edges ⋈ labels) exchange never caps parallelism on a
    # big cluster; override for tests or known-small graphs
    if num_buckets is None:
        num_buckets = _default_num_buckets()

    labels = ids_ds.map_batches(
        lambda b: pa.table({"node": b[id_col], "label": b[id_col]}),
        batch_format="pyarrow",
    ).repartition(num_buckets).materialize()

    if edges.count() == 0:  # no edges: every node is its own component
        return labels.map_batches(
            lambda b: pa.table({id_col: b["node"], "label": b["label"]}),
            batch_format="pyarrow",
        )

    def total(ds) -> int:
        return int(ds.aggregate(Sum("label", alias_name="s"))["s"])

    prev = total(labels)
    for rnd in range(max_rounds):
        # neighbor messages: each edge forwards its node's current label
        # to the neighbor — via the explicit bucketed hash join (robust
        # to the schemaless-empty-partition blocks hash aggregation can
        # emit, which break Dataset.join's pyarrow key resolution)
        msgs = bucketed_hash_join(
            edges, labels, left_on="node", right_on="node", num_buckets=num_buckets
        ).map_batches(
            lambda b: pa.table({"node": b["nbr"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        # repartition caps the label block count at the join width every
        # round: the groupby's sort-shuffle emits partitions proportional
        # to its INPUT block count, so without the cap blocks compound
        # ~2x per round (192 → 448 → 960 measured on a 500-node graph)
        # and per-round executor overhead grows without bound — at 25
        # rounds that is a million near-empty blocks, a real cluster
        # killer, not a toy artifact
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(num_buckets)
            .materialize()
        )
        if rnd >= doubling_after:
            # pointer doubling: label[v] ← label[label[v]].  Every label
            # value IS a node id present in `labels` (identity start +
            # min over node ids), so the inner self-join is total; the
            # identity-start invariant label[u] ≤ u makes the looked-up
            # label2 ≤ label, so it replaces (not mins with) the old one.
            reps = labels.map_batches(
                lambda b: pa.table({"key": b["node"], "label2": b["label"]}),
                batch_format="pyarrow",
            )
            labels = bucketed_hash_join(
                labels, reps, left_on="label", right_on="key",
                num_buckets=num_buckets,
            ).map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["label2"]}),
                batch_format="pyarrow",
            ).repartition(num_buckets).materialize()
        cur = total(labels)
        if stats is not None:
            stats["rounds"] = rnd + 1
        if cur == prev:  # monotone ⇒ fixed point
            break
        prev = cur
    return labels.map_batches(
        lambda b: pa.table({id_col: b["node"], "label": b["label"]}),
        batch_format="pyarrow",
    )


def keep_ids_from_labels(labels_ds, id_col: str = "doc_id") -> pd.DataFrame:
    """Component representatives: rows where id == label (the min id of
    each component), i.e. the canonical keep-set."""
    import pyarrow.compute as pc

    def reps(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[id_col], batch["label"])).select([id_col])

    out = labels_ds.map_batches(reps, batch_format="pyarrow").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)

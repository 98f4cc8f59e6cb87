"""Connected components over near-duplicate pair sets — the step that
turns pairwise dedup candidates into CLUSTERS (one canonical doc per
group of mutual near-duplicates).

Distributed min-label propagation WITH pointer jumping: every node
starts labeled with its own id; each round (a) labels flow one hop
across edges, (b) every node adopts its label's label (pointer
doubling).  The jump step makes convergence O(log diameter) rounds
instead of O(diameter) — a chain of 1M docs resolves in ~20 rounds.
Each round is a few hash-partitioned shuffles over (node, label)
pairs; convergence = the global label sum stops changing (labels are
monotonically non-increasing).  No driver-side graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import default_partitions

_MSG_SCHEMA = pa.schema(
    [("k", pa.int64()), ("dst", pa.int64()), ("lbl", pa.int64()), ("_part", pa.int64())]
)


def _lookup(requests: ray.data.Dataset, providers: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """Hash-partitioned key lookup: requests (k, dst) × providers
    (k, lbl) → (node=dst, label=lbl) for every request whose key has a
    provider.  The shared kernel of the edge pass and the jump pass."""

    def route(group: pa.Table) -> pa.Table:
        if not group.num_columns or not group.num_rows:
            return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        has_lbl = np.asarray(pc.is_valid(group["lbl"]).to_numpy(zero_copy_only=False))
        lab_rows = group.filter(pa.array(has_lbl))
        req_rows = group.filter(pa.array(~has_lbl))
        if not req_rows.num_rows or not lab_rows.num_rows:
            return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        lk = np.asarray(lab_rows["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        lv = np.asarray(lab_rows["lbl"].to_numpy(zero_copy_only=False), dtype=np.int64)
        o = np.argsort(lk, kind="stable")
        lk, lv = lk[o], lv[o]
        rk = np.asarray(req_rows["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        rd = np.asarray(req_rows["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        idx = np.searchsorted(lk, rk)
        idx = np.minimum(idx, max(len(lk) - 1, 0))
        found = lk[idx] == rk
        return pa.table({"node": pa.array(rd[found]), "label": pa.array(lv[idx[found]])})

    return requests.union(providers).groupby("_part").map_groups(route, batch_format="pyarrow")


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 30,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(a, b) undirected pair rows → (doc_id, component) where
    ``component`` is the minimum doc id reachable from ``doc_id``
    (only nodes appearing in at least one pair are emitted)."""
    P = num_partitions or default_partitions()

    def to_edge_requests(b: pa.Table) -> pa.Table:
        if not b.num_columns or not b.num_rows:
            return _MSG_SCHEMA.empty_table()
        x = np.asarray(b[a_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        y = np.asarray(b[b_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        src = np.concatenate([x, y])
        dst = np.concatenate([y, x])
        return pa.table(
            {
                "k": pa.array(src),
                "dst": pa.array(dst),
                "lbl": pa.nulls(len(src), pa.int64()),
                "_part": pa.array(src % P),
            }
        ).cast(_MSG_SCHEMA)

    # Clamp to P blocks once: groupby/sort output block count tracks the
    # input block count, and every round unions three datasets — without
    # the clamp the label dataset's block count (and thus per-round
    # scheduling cost) grows geometrically across rounds.
    edge_requests = (
        pairs.map_batches(to_edge_requests, batch_format="pyarrow").repartition(P).materialize()
    )

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(np.asarray(b["k"].to_numpy(zero_copy_only=False), dtype=np.int64))
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    from ray.data.aggregate import Min, Sum

    labels = (
        edge_requests.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def providers_of(ls: ray.data.Dataset) -> ray.data.Dataset:
        def tag(b: pa.Table) -> pa.Table:
            node = np.asarray(b["node"].to_numpy(zero_copy_only=False), dtype=np.int64)
            return pa.table(
                {
                    "k": pa.array(node),
                    "dst": pa.nulls(b.num_rows, pa.int64()),
                    "lbl": b["label"].cast(pa.int64()),
                    "_part": pa.array(node % P),
                }
            ).cast(_MSG_SCHEMA)

        return ls.map_batches(tag, batch_format="pyarrow")

    def jump_requests_of(ls: ray.data.Dataset) -> ray.data.Dataset:
        # request label-of-label: key = my label, dst = me
        def tag(b: pa.Table) -> pa.Table:
            node = np.asarray(b["node"].to_numpy(zero_copy_only=False), dtype=np.int64)
            lbl = np.asarray(b["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
            return pa.table(
                {
                    "k": pa.array(lbl),
                    "dst": pa.array(node),
                    "lbl": pa.nulls(b.num_rows, pa.int64()),
                    "_part": pa.array(lbl % P),
                }
            ).cast(_MSG_SCHEMA)

        return ls.map_batches(tag, batch_format="pyarrow")

    def combine(ls: ray.data.Dataset, msgs: ray.data.Dataset) -> ray.data.Dataset:
        keep = ls.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        return (
            msgs.union(keep)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(P)
            .materialize()
        )

    def label_sum(ls: ray.data.Dataset) -> int:
        agg = ls.aggregate(Sum("label", alias_name="s"))
        return int(agg["s"] or 0)

    prev = label_sum(labels)
    for _ in range(max_iters):
        # (a) one hop across edges
        labels = combine(labels, _lookup(edge_requests, providers_of(labels), P))
        # (b) pointer jump: adopt label[label]
        labels = combine(labels, _lookup(jump_requests_of(labels), providers_of(labels), P))
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )

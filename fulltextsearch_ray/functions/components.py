"""Connected components over near-duplicate pair sets — the step that
turns pairwise dedup candidates into CLUSTERS (one canonical doc per
group of mutual near-duplicates).

Distributed min-label propagation WITH pointer jumping: every node
starts labeled with the minimum of its own id and its neighbors'; each
round (a) labels flow one hop across edges and (b) every node adopts
its label's label (pointer doubling) — both message kinds ride the
SAME hash-partitioned lookup pass, so one round costs one lookup
groupby + one min-combine groupby.  The jump step makes convergence
O(log diameter) rounds instead of O(diameter) — a chain of 1M docs
resolves in ~20 rounds.  Convergence = the global label sum stops
changing (labels are monotonically non-increasing).  No driver-side
graph: driver state is one integer per round.

Partition count tracks the EDGE COUNT (one partition per ~64k
messages, capped by the cluster default) — groupby/sort output block
counts follow input block counts, so tiny graphs would otherwise pay
64-way shuffle scheduling per round, and every round's unions would
grow the label dataset's block count geometrically without the
explicit repartition clamp.
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


def _route_lookup(group: pa.Table) -> pa.Table:
    """One partition of the lookup: provider rows (lbl set) answer
    request rows (dst set) sharing their key — emits (node=dst,
    label=provider's lbl) for every matched request."""
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


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 30,
    num_partitions: int | None = None,
    rows_per_partition: int = 65536,
) -> ray.data.Dataset:
    """(a, b) undirected pair rows → (doc_id, component) where
    ``component`` is the minimum doc id reachable from ``doc_id``
    (only nodes appearing in at least one pair are emitted)."""
    from ray.data.aggregate import Min, Sum

    P_cap = num_partitions or default_partitions()

    def to_edge_requests(P: int):
        def fn(b: pa.Table) -> pa.Table:
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

        return fn

    # Materialize the pair set once (it feeds the count below AND the
    # edge pass — without this the caller's whole candidate pipeline
    # would re-execute for each consumer), then size P to the data.
    pairs = pairs.materialize()
    n_msgs = 2 * pairs.count()
    if n_msgs == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    P = max(2, min(P_cap, (n_msgs + rows_per_partition - 1) // rows_per_partition))

    edge_requests = (
        pairs.map_batches(to_edge_requests(P), batch_format="pyarrow").repartition(P).materialize()
    )

    # seed: label(node) = min(node, neighbors) — the Min aggregate over
    # (k, dst) pairs folds the first hop into initialization for free
    def init_labels(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        k = np.asarray(b["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(b["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"node": pa.array(k), "label": pa.array(np.minimum(k, d))})

    labels = (
        edge_requests.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .repartition(P)
        .materialize()
    )

    def requests_of(ls: ray.data.Dataset) -> ray.data.Dataset:
        """Providers + jump requests in ONE pass over the labels."""

        def tag(b: pa.Table) -> pa.Table:
            node = np.asarray(b["node"].to_numpy(zero_copy_only=False), dtype=np.int64)
            lbl = np.asarray(b["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
            provider = pa.table(
                {
                    "k": pa.array(node),
                    "dst": pa.nulls(len(node), pa.int64()),
                    "lbl": pa.array(lbl),
                    "_part": pa.array(node % P),
                }
            )
            jump = pa.table(
                {
                    "k": pa.array(lbl),
                    "dst": pa.array(node),
                    "lbl": pa.nulls(len(node), pa.int64()),
                    "_part": pa.array(lbl % P),
                }
            )
            return pa.concat_tables([provider.cast(_MSG_SCHEMA), jump.cast(_MSG_SCHEMA)])

        return ls.map_batches(tag, batch_format="pyarrow")

    def label_sum(ls: ray.data.Dataset) -> int:
        agg = ls.aggregate(Sum("label", alias_name="s"))
        return int(agg["s"] or 0)

    prev = label_sum(labels)
    for _ in range(max_iters):
        # one fused round: edge-hop messages AND pointer-jump messages
        # resolve in a single hash-partitioned lookup, then one
        # min-combine with the current labels
        msgs = (
            edge_requests.union(requests_of(labels))
            .groupby("_part")
            .map_groups(_route_lookup, batch_format="pyarrow")
        )
        keep = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(keep)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(P)
            .materialize()
        )
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )

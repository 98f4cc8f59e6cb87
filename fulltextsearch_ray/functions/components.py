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


def canonical_docs(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    broadcast_budget: int = 5_000_000,
    num_partitions: int | None = None,
    **cc_kwargs,
) -> ray.data.Dataset:
    """APPLY near-dup clustering: keep each component's canonical
    (minimum-id) member and every unpaired document — the final
    "drop the duplicates" step of a dedup pipeline.

    The kill set (non-canonical member ids) is usually a small
    fraction of the corpus: below ``broadcast_budget`` rows it ships
    once via ``ray.put`` (sorted array, searchsorted per batch — no
    shuffle of the doc payloads).  Past the budget the filter becomes
    a distributed anti-join: docs and kill keys hash-partition on
    ``id % P`` and each partition task drops its matches — doc rows
    shuffle once, driver holds nothing.
    """
    comp = connected_components(pairs, **cc_kwargs)

    def kill_rows(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["doc_id"], b["component"])
        return pa.table({"kill": b.filter(keep)["doc_id"].cast(pa.int64())})

    kills = comp.map_batches(kill_rows, batch_format="pyarrow").materialize()
    n_kills = kills.count()
    if n_kills <= broadcast_budget:
        arr = np.sort(
            np.concatenate(
                [
                    np.asarray(b["kill"].to_numpy(zero_copy_only=False), dtype=np.int64)
                    for b in kills.iter_batches(batch_format="pyarrow")
                ]
                or [np.array([], dtype=np.int64)]
            )
        )
        kills_ref = ray.put(arr)

        def drop(batch: pa.Table) -> pa.Table:
            k = ray.get(kills_ref)
            ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
            if not len(k):
                return batch
            idx = np.searchsorted(k, ids)
            idx = np.minimum(idx, len(k) - 1)
            return batch.filter(pa.array(k[idx] != ids))

        return docs.map_batches(drop, batch_format="pyarrow")

    # large-kill-set path: tagged-union hash-partitioned anti-join
    P = num_partitions or default_partitions()
    schema = docs.schema().base_schema
    names = schema.names

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return b.append_column("_kill", pa.nulls(b.num_rows, pa.int64())).append_column(
            "_part", pa.array(ids % P)
        )

    def tag_kills(b: pa.Table) -> pa.Table:
        k = np.asarray(b["kill"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cols = {n: pa.nulls(len(k), schema.field(n).type) for n in names}
        cols["_kill"] = pa.array(k)
        cols["_part"] = pa.array(k % P)
        return pa.table(cols)

    unioned = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        kills.map_batches(tag_kills, batch_format="pyarrow")
    )

    def anti(group: pa.Table) -> pa.Table:
        if not group.num_columns or not group.num_rows:
            return schema.empty_table()
        is_kill = np.asarray(pc.is_valid(group["_kill"]).to_numpy(zero_copy_only=False))
        doc_rows = group.filter(pa.array(~is_kill))
        k = np.unique(
            np.asarray(group.filter(pa.array(is_kill))["_kill"].to_numpy(zero_copy_only=False))
        )
        ids = np.asarray(doc_rows[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = ~np.isin(ids, k)
        return doc_rows.select(names).filter(pa.array(keep))

    return unioned.groupby("_part").map_groups(anti, batch_format="pyarrow")

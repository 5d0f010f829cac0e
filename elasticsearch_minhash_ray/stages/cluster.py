"""Connected-component clustering over the verified edge Dataset (SURVEY.md §2.4).

Two implementations with identical results:

- :func:`connected_components_driver` — streamed union-find on the driver
  (edges consumed via ``iter_batches``; memory O(nodes-with-edges)). The
  default below ``max_driver_edges`` — verified duplicate edges are a small
  fraction of corpus rows, but the guard keeps the driver honest.
- :func:`connected_components_distributed` — iterative min-label propagation
  expressed purely as hash-partitioned groupbys (the "join" is a pandas merge
  inside one co-partitioned group — both sides are shuffled by the same key,
  so it is an explicit partitioned hash join, no driver state). Rounds needed
  = graph diameter; the LSH bucket stage links oversized buckets in a STAR
  shape precisely so component diameters stay O(1) (SURVEY.md §2.4 skew
  guard), giving a small constant number of rounds. Convergence is detected
  by an order-insensitive label-multiset checksum.

Output: (doc_key:int64, cluster_id:int64) for every node that appears in an
edge; cluster_id = min doc_key of the component. Singleton docs are their own
implicit cluster — materializing 10^12 singleton rows is pointless, so they
are excluded unless the caller unions them in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._arrow import table_from_pandas
from ..grouping import map_copartitioned

_MIX = np.uint64(0x2545F4914F6CDD1D)
_MIX2 = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------------------------------
# driver union-find (default path)
# ---------------------------------------------------------------------------


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        # path compression
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        p = self.parent
        p.setdefault(a, a)
        p.setdefault(b, b)
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            p[rb] = ra


def connected_components_driver(edges, max_driver_edges: int = 50_000_000) -> pa.Table:
    """edges: Dataset or pa.Table with int64 ``src``/``dst`` columns.

    Vectorized min-label propagation with path compression over compacted
    node ids (np.unique is ascending, so the min compact index IS the min
    doc_key — cluster_id = min doc_key of the component). O(E · log D)."""
    seen = 0
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    if isinstance(edges, pa.Table):
        batches = edges.to_batches()
    else:
        batches = edges.iter_batches(batch_size=1_000_000, batch_format="pyarrow")
    for b in batches:
        if b.num_rows == 0:
            continue
        srcs.append(np.asarray(b["src"], dtype=np.int64))
        dsts.append(np.asarray(b["dst"], dtype=np.int64))
        seen += len(srcs[-1])
        if seen > max_driver_edges:
            raise ValueError(
                f"edge count exceeds max_driver_edges={max_driver_edges}; "
                "use connected_components_distributed"
            )
    if not srcs:
        return pa.table({"doc_key": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    nodes, inv = np.unique(np.r_[src, dst], return_inverse=True)
    ea, eb = inv[: len(src)], inv[len(src) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[ea], label[eb])
        before = label.copy()
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        label = np.minimum(label, label[label])  # pointer-jump compression
        if np.array_equal(label, before):
            break
    return pa.table(
        {"doc_key": pa.array(nodes, pa.int64()), "cluster_id": pa.array(nodes[label], pa.int64())}
    )


# ---------------------------------------------------------------------------
# distributed min-label propagation
# ---------------------------------------------------------------------------


def _part_of(x: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((x.astype(np.int64).view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(
            np.int32
        )


def _init_labels(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Directed edge block → partial (node, label=min neighbor∪self) rows."""
    src = np.asarray(batch["src"], dtype=np.int64)
    dst = np.asarray(batch["dst"], dtype=np.int64)
    import pandas as pd  # lazy: keeps pandas out of every worker's package import

    node = np.r_[src, dst]
    nbr = np.r_[dst, src]
    df = pd.DataFrame({"node": node, "label": np.minimum(node, nbr)})
    agg = df.groupby("node", as_index=False, sort=False)["label"].min()
    return pa.table(
        {
            "node": pa.array(agg["node"].to_numpy()),
            "label": pa.array(agg["label"].to_numpy()),
            "part": pa.array(_part_of(agg["node"].to_numpy(), num_partitions), pa.int32()),
        }
    )


def _min_label_per_node(batch: pa.Table) -> pa.Table:
    df = batch.select(["node", "label", "part"]).to_pandas()
    agg = df.groupby("node", as_index=False, sort=False).agg({"label": "min", "part": "first"})
    return table_from_pandas(agg[["node", "label", "part"]])


def _propagate_group(batch: pa.Table) -> pa.Table:
    """Co-partitioned group of label rows (key=node) and directed edge rows
    (key=v, other=u): emit (node=u, label=label[v]) messages."""
    df = batch.select(["key", "other", "label", "is_edge"]).to_pandas()
    lab = df[~df["is_edge"]][["key", "label"]]
    edge = df[df["is_edge"]][["key", "other"]]
    msgs = edge.merge(lab, on="key", how="inner")  # partitioned hash join
    return pa.table(
        {
            "node": pa.array(msgs["other"].to_numpy(np.int64)),
            "label": pa.array(msgs["label"].to_numpy(np.int64)),
        }
    )


def _label_checksum(labels) -> tuple[int, int]:
    def part(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["node"]).view(np.uint64)
        l = np.asarray(batch["label"]).view(np.uint64)
        with np.errstate(over="ignore"):
            h = np.uint64(((n * _MIX) ^ (l * _MIX2)).sum(dtype=np.uint64))
        return pa.table({"n": pa.array([len(n)], pa.int64()), "h": pa.array([h.view(np.int64)], pa.int64())})

    parts = labels.map_batches(part, batch_format="pyarrow").to_pandas()
    if "n" not in parts.columns:  # zero-block label set
        return 0, 0
    with np.errstate(over="ignore"):
        return int(parts["n"].sum()), int(np.sum(parts["h"].to_numpy().view(np.uint64), dtype=np.uint64))


def connected_components_distributed(edges, num_partitions: int = 64, max_rounds: int = 30):
    """edges: Dataset with int64 src/dst. Returns Dataset (doc_key, cluster_id).

    Per round: (1) join labels to edge targets within co-partitioned groups →
    min-label messages, (2) fold messages into labels via groupby(node) min.
    Terminates when the label multiset stops changing (≤ diameter rounds).
    """
    edges = edges.materialize()  # reused every round
    # every round pays per-block shuffle overhead; size the block count to
    # the edge count (tiny graphs in 1 block, ~1M edges per block at scale)
    n_edges = edges.count()
    if n_edges == 0:
        # empty/edge-free corpus: the label machinery below assumes non-empty
        # blocks; the result is the typed empty cluster set
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"doc_key": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    nblocks = max(1, min(num_partitions, n_edges // 1_000_000 + 1))
    edges = edges.repartition(nblocks)

    def directed(batch: pa.Table, n=num_partitions) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        dst = np.asarray(batch["dst"], dtype=np.int64)
        key = np.r_[src, dst]  # join key = edge target v
        other = np.r_[dst, src]  # u, the message recipient
        return pa.table(
            {
                "key": pa.array(key),
                "other": pa.array(other),
                "label": pa.array(np.zeros(len(key), np.int64)),
                "is_edge": pa.array(np.ones(len(key), bool)),
                "part": pa.array(_part_of(key, n), pa.int32()),
            }
        )

    edir = edges.map_batches(directed, batch_format="pyarrow").materialize()

    labels = map_copartitioned(
        edges.map_batches(lambda b, n=num_partitions: _init_labels(b, n), batch_format="pyarrow"),
        "part",
        _min_label_per_node,
    ).materialize()
    prev = _label_checksum(labels)
    converged = False
    for _ in range(max_rounds):

        def as_join_rows(batch: pa.Table) -> pa.Table:
            node = np.asarray(batch["node"], dtype=np.int64)
            return pa.table(
                {
                    "key": pa.array(node),
                    "other": pa.array(np.zeros(len(node), np.int64)),
                    "label": pa.array(np.asarray(batch["label"], dtype=np.int64)),
                    "is_edge": pa.array(np.zeros(len(node), bool)),
                    "part": pa.array(np.asarray(batch["part"], dtype=np.int32), pa.int32()),
                }
            )

        def as_jump_rows(batch: pa.Table, n=num_partitions) -> pa.Table:
            # pointer-jump probe: ask the LABEL node for ITS label — rounds
            # needed drop from O(diameter) to O(log diameter) (crucial for
            # long near-dup chains at corpus scale)
            node = np.asarray(batch["node"], dtype=np.int64)
            lab = np.asarray(batch["label"], dtype=np.int64)
            return pa.table(
                {
                    "key": pa.array(lab),
                    "other": pa.array(node),
                    "label": pa.array(np.zeros(len(node), np.int64)),
                    "is_edge": pa.array(np.ones(len(node), bool)),
                    "part": pa.array(_part_of(lab, n), pa.int32()),
                }
            )

        msgs = map_copartitioned(
            labels.map_batches(as_join_rows, batch_format="pyarrow").union(
                edir, labels.map_batches(as_jump_rows, batch_format="pyarrow")
            ),
            "part",
            _propagate_group,
        )

        def with_part(batch: pa.Table, n=num_partitions) -> pa.Table:
            node = np.asarray(batch["node"], dtype=np.int64)
            return batch.append_column("part", pa.array(_part_of(node, n), pa.int32()))

        labels = map_copartitioned(
            msgs.map_batches(with_part, batch_format="pyarrow").union(labels),
            "part",
            _min_label_per_node,
        ).materialize()
        # union grows the block count every round; rebound it so per-round
        # shuffle cost stays constant across rounds
        if labels.num_blocks() > 2 * nblocks:
            labels = labels.repartition(nblocks).materialize()
        cur = _label_checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(graph diameter > 2^rounds?); raise max_rounds"
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_key": batch["node"], "cluster_id": batch["label"]}
        )

    return labels.map_batches(finish, batch_format="pyarrow")

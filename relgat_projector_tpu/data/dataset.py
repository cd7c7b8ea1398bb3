"""Dataset orchestration: compaction, split, graph build, static batching.

TPU redesign of reference ``dataset/relgat_dataset.py:10-137`` +
``dataset/edge.py``:
- id compaction over sorted node ids (parity ``relgat_dataset.py:61-63``),
- seeded shuffle + ratio split (parity ``:70-88``),
- the message-passing graph is built from TRAIN edges only — eval edges
  never leak into propagation (parity ``:123-137``),
- batches are static-shape id arrays with a validity mask (the reference
  used a ragged DataLoader with identity collate); epoch order is a host
  permutation,
- negative sampling moves OFF the host: the reference's per-sample Python
  rejection loop (``edge.py:100-113``) is replaced by device-resident
  ``ops.sampling.sample_negative_dst`` inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, NamedTuple, Optional, Tuple

import numpy as np

from relgat_projector_tpu.data.graph import (
    GraphData,
    build_graph,
    pad_node_embeddings,
)


class Batch(NamedTuple):
    src: np.ndarray     # [B] int32
    rel: np.ndarray     # [B] int32
    dst: np.ndarray     # [B] int32
    weight: np.ndarray  # [B] float32 validity mask (1 = real example)


class RelGATData:
    """Host-side dataset container feeding the device-resident train loop."""

    def __init__(
        self,
        node2emb: Dict[int, np.ndarray],
        rel2idx: Dict[str, int],
        edge_index_raw: List[Tuple[int, int, str]],
        *,
        train_ratio: float = 0.9,
        seed: int = 42,
        edge_pad_multiple: int = 128,
        node_pad_multiple: int = 8,
        blocked: bool = False,
        graph_shards: int = 1,
        halo_shards: int = 0,
        halo_overlap: bool = False,
        scan_segments: int = 0,
        partition_nodes: bool = False,
        chunk_edges: Optional[int] = 256,
        block_nodes: Optional[int] = 128,
        kernel_precision: str = "highest",
        heads_features: Optional[int] = None,
        materialize_features: bool = True,
    ):
        self.rel2idx = dict(rel2idx)
        self.num_rel = len(rel2idx)
        self.train_ratio = float(train_ratio)
        self.seed = int(seed)

        # Sorted-id compaction (parity ``relgat_dataset.py:61-63``).
        self.all_node_ids = sorted(node2emb.keys())
        self.id2idx = {nid: i for i, nid in enumerate(self.all_node_ids)}
        self.num_nodes = len(self.all_node_ids)

        # ``materialize_features=False`` (multi-process halo training): the
        # full [N, D] matrix is NEVER stacked host-side — each process later
        # materializes exactly the row ranges of its addressable feature
        # shards through :meth:`feature_rows` (SURVEY §5.8: per-process
        # shard construction; on real multi-host fleets the [N, D] stack is
        # the one thing that cannot be replicated per host).
        self._materialize = bool(materialize_features)
        self._node2emb = None if self._materialize else node2emb
        self.features_materialized_rows = 0
        self.emb_dim = int(
            np.asarray(node2emb[self.all_node_ids[0]]).shape[-1]
        )
        emb = None
        if self._materialize:
            emb = np.stack(
                [
                    np.asarray(node2emb[nid], dtype=np.float32)
                    for nid in self.all_node_ids
                ]
            )

        # Map triplets onto compact indices and integer relation ids.
        def _rel_id(r):
            return self.rel2idx[r] if isinstance(r, str) else int(r)

        edges = np.asarray(
            [
                (self.id2idx[s], self.id2idx[d], _rel_id(r))
                for s, d, r in edge_index_raw
            ],
            dtype=np.int64,
        ).reshape(-1, 3)

        # Seeded shuffle + ratio split (parity ``relgat_dataset.py:70-88``).
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(edges.shape[0])
        edges = edges[perm]
        n_train = int(self.train_ratio * edges.shape[0])
        self.train_edges = edges[:n_train]
        self.eval_edges = edges[n_train:]
        print(f"Number of edges (relations): {edges.shape[0]}")
        print(
            f" - train: {len(self.train_edges)} ({self.train_ratio * 100:.1f} %)"
        )
        print(
            f" - eval: {len(self.eval_edges)} "
            f"({100 - self.train_ratio * 100:.1f} %)"
        )

        # Blocked-layout auto-tuning (``data/layout_tuner.py``): with
        # ``chunk_edges``/``block_nodes`` = None, (TD, TE) are picked from
        # THIS graph's measured degree distribution via the calibrated cost
        # model — the optimum is degree-specific (BENCH_NOTES TD/TE
        # sweeps), so hardcoded constants under-train non-uniform KGs.
        # Runs on the pre-partition labeling (the relabel below needs the
        # tuned TD for its row alignment; the permutation only mildly
        # shifts the per-block degree histogram).
        self.layout_choice = None
        if blocked and (chunk_edges is None or block_nodes is None):
            from relgat_projector_tpu.data.layout_tuner import pick_layout

            choice = pick_layout(
                self.train_edges[:, 0],
                self.train_edges[:, 1],
                self.num_nodes,
                kernel_precision=kernel_precision,
                scanned=scan_segments > 1,
                heads_features=heads_features,
                num_rel=self.num_rel,
            )
            self.layout_choice = choice
            if chunk_edges is None:
                chunk_edges = choice.chunk_edges
            if block_nodes is None:
                block_nodes = choice.block_nodes
            print(
                f"Auto-tuned blocked layout: TD={block_nodes} "
                f"TE={chunk_edges} ({choice.reason})"
            )
        else:
            chunk_edges = 256 if chunk_edges is None else chunk_edges
            block_nodes = 128 if block_nodes is None else block_nodes

        # Optional min-cut relabeling for the halo path
        # (``data/partition.py``): cluster nodes by train-edge structure and
        # pack clusters into the halo shards' contiguous id ranges, so
        # boundary traffic reflects the graph's real cut instead of the
        # accidents of input id order. The permutation is applied
        # consistently to embeddings and BOTH edge splits; semantics are
        # relabel-invariant.
        self.node_perm: Optional[np.ndarray] = None
        self.partition_stats: Optional[Dict[str, float]] = None
        if partition_nodes and halo_shards > 1:
            from relgat_projector_tpu.data.partition import (
                partition_node_permutation,
            )
            from relgat_projector_tpu.parallel.halo import (
                halo_rows_per_shard,
            )

            rows = halo_rows_per_shard(
                self.num_nodes, halo_shards, blocked=blocked,
                block_nodes=block_nodes,
            )
            perm, stats = partition_node_permutation(
                self.train_edges[:, 0],
                self.train_edges[:, 1],
                self.num_nodes,
                halo_shards,
                rows,
            )
            self.node_perm = perm
            self.partition_stats = stats
            if emb is not None:
                emb = emb[np.argsort(perm)]  # row new_id = old node's emb
            for arr in (self.train_edges, self.eval_edges):
                arr[:, 0] = perm[arr[:, 0]]
                arr[:, 1] = perm[arr[:, 1]]
            print(
                "Partitioned nodes for halo exchange: edge cut "
                f"{stats['edge_cut_before']:.3f} -> "
                f"{stats['edge_cut_after']:.3f} over {halo_shards} shards"
            )

        # Message-passing graph from TRAIN edges only (``:123-137``).
        self.graph: GraphData = build_graph(
            self.train_edges[:, 0],
            self.train_edges[:, 1],
            self.train_edges[:, 2],
            num_nodes=self.num_nodes,
            edge_pad_multiple=edge_pad_multiple,
            node_pad_multiple=node_pad_multiple,
            blocked=blocked,
            chunk_edges=chunk_edges,
            block_nodes=block_nodes,
            graph_shards=graph_shards,
            halo_shards=halo_shards,
            halo_overlap=halo_overlap,
            scan_segments=scan_segments,
        )
        # Frozen embeddings padded to the graph's node count (None in
        # deferred-feature mode — consumers go through feature_rows).
        self.node_emb = (
            pad_node_embeddings(emb, self.graph.num_nodes)
            if emb is not None
            else None
        )

        self._epoch_rng = np.random.default_rng(self.seed + 1)

    def feature_rows(self, lo: int, hi: int) -> np.ndarray:
        """Materialize embedding rows ``[lo, hi)`` of the (relabeled,
        padded) feature matrix — the per-process shard loader for
        multi-host halo training. Rows past ``num_nodes`` are padding
        zeros; with a partition permutation active, row ``new_id`` holds
        the embedding of the node relabeled to ``new_id``. Tracks how many
        rows this process ever materialized
        (``features_materialized_rows``) so tests can assert a process
        never builds the full matrix."""
        lo, hi = int(lo), int(hi)
        out = np.zeros((hi - lo, self.emb_dim), np.float32)
        n_real = min(hi, self.num_nodes) - lo
        if n_real > 0:
            if self._materialize:
                out[:n_real] = self.node_emb[lo : lo + n_real]
            else:
                new_ids = np.arange(lo, lo + n_real)
                old_ids = (
                    np.argsort(self.node_perm)[new_ids]
                    if self.node_perm is not None
                    else new_ids
                )
                for i, o in enumerate(old_ids):
                    out[i] = np.asarray(
                        self._node2emb[self.all_node_ids[int(o)]],
                        np.float32,
                    )
        self.features_materialized_rows += hi - lo
        return out

    @property
    def num_train(self) -> int:
        return int(self.train_edges.shape[0])

    @property
    def num_eval(self) -> int:
        return int(self.eval_edges.shape[0])

    def _iter_batches(
        self,
        edges: np.ndarray,
        batch_size: int,
        shuffle: bool,
        drop_last: bool = False,
        rng: Optional[np.random.Generator] = None,
    ) -> Iterator[Batch]:
        n = edges.shape[0]
        order = (
            (rng or self._epoch_rng).permutation(n) if shuffle else np.arange(n)
        )
        end = (n // batch_size) * batch_size if drop_last else n
        for lo in range(0, end, batch_size):
            idx = order[lo : lo + batch_size]
            b = idx.shape[0]
            src = np.zeros(batch_size, np.int32)
            rel = np.zeros(batch_size, np.int32)
            dst = np.zeros(batch_size, np.int32)
            w = np.zeros(batch_size, np.float32)
            chunk = edges[idx]
            src[:b] = chunk[:, 0]
            dst[:b] = chunk[:, 1]
            rel[:b] = chunk[:, 2]
            w[:b] = 1.0
            yield Batch(src=src, rel=rel, dst=dst, weight=w)

    def train_batches(self, batch_size: int) -> Iterator[Batch]:
        """Static-shape shuffled epoch over train triplets."""
        return self._iter_batches(self.train_edges, batch_size, shuffle=True)

    def eval_batches(self, batch_size: int) -> Iterator[Batch]:
        return self._iter_batches(self.eval_edges, batch_size, shuffle=False)

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, -(-self.num_train // batch_size))

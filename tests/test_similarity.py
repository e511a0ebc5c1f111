"""ANN quality gates (SURVEY §2C3): IVF recall vs exact brute force.

The IVF path trades recall for the scale-safe equi-join shape; this gate
pins the trade-off so "approximate" can't silently degrade to garbage.
"""

from __future__ import annotations

import numpy as np

from data_bridge_spark.operators.similarity import kmeans_centroids
from data_bridge_spark.registry import REGISTRY


def _exact_topk(emb_by_id: dict[int, np.ndarray], probe_ids: list[int], k: int) -> dict[int, set[int]]:
    ids = sorted(emb_by_id)
    mat = np.stack([emb_by_id[i] for i in ids])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out: dict[int, set[int]] = {}
    for pid in probe_ids:
        p = emb_by_id[pid] / np.linalg.norm(emb_by_id[pid])
        sims = mat @ p
        order = [ids[j] for j in np.argsort(-sims) if ids[j] != pid]
        out[pid] = set(order[:k])
    return out


def test_ivf_recall_at_5(spark, sf_dir):
    rows = REGISTRY["sim_ivf"].fn(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.probe_id, set()).add(r.cand_id)

    emb_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb_rows}
    probe_ids = [i for i in range(20) if i in emb]
    exact = _exact_topk(emb, probe_ids, k=5)

    recalls = [len(got.get(pid, set()) & exact[pid]) / 5 for pid in probe_ids]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.6, f"IVF recall@5 = {recall:.2f} < 0.6 over {len(probe_ids)} probes"


def test_kmeans_is_deterministic_and_moves_centroids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = kmeans_centroids(emb, k=4, iters=2)
    c2 = kmeans_centroids(emb, k=4, iters=2)
    assert c1 == c2  # decimal-summed updates: bit-stable across runs
    seeds = kmeans_centroids(emb, k=4, iters=0)
    assert c1 != seeds  # iterations actually update the centroids

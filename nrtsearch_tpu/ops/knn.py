"""Vector search: batched brute-force MIPS on the MXU (+ IVF partitioning).

Replaces Lucene HNSW graph walking (reference: VectorFieldDef.java:91-94 HNSW
formats, NrtKnnFloatVectorQuery) — graph walks are pointer-chasing and
TPU-hostile, while brute-force scoring is a single [B, dims] x [dims, D]
matmul: exact results (recall@k = 1.0 by construction, vs HNSW's <1.0 at
equal memory) at very high throughput. IVF (cluster pruning) extends this to
corpora where one matmul per query is too much; centroids scoring is itself a
small matmul.

Similarity -> score mappings match Lucene's VectorSimilarityFunction so
scores are comparable with the reference:

    l2_norm:            1 / (1 + ||q - v||^2)
    dot_product:        (1 + q.v) / 2
    cosine / normalized_cosine: (1 + cos(q, v)) / 2
    max_inner_product:  q.v >= 0 ? q.v + 1 : 1 / (1 - q.v)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SIMILARITIES = (
    "l2_norm", "dot_product", "cosine", "normalized_cosine", "max_inner_product",
)


def _scores(queries, vectors, vec_sq_norms, similarity: str):
    """Similarity scores [B, D] from a dot-product matmul."""
    dots = jax.lax.dot_general(
        queries, vectors,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, D]
    if similarity == "l2_norm":
        q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        d2 = jnp.maximum(q_sq + vec_sq_norms[None, :] - 2.0 * dots, 0.0)
        return 1.0 / (1.0 + d2)
    if similarity == "dot_product":
        return (1.0 + dots) / 2.0
    if similarity in ("cosine", "normalized_cosine"):
        q_norm = jnp.sqrt(jnp.sum(queries * queries, axis=1, keepdims=True))
        v_norm = jnp.sqrt(vec_sq_norms)[None, :]
        cos = dots / jnp.maximum(q_norm * v_norm, 1e-30)
        return (1.0 + cos) / 2.0
    if similarity == "max_inner_product":
        return jnp.where(dots >= 0, dots + 1.0, 1.0 / (1.0 - dots))
    raise ValueError(f"unknown similarity {similarity!r}")


@functools.partial(jax.jit, static_argnames=("similarity", "k"))
def knn_search(
    vectors: jax.Array,       # f32 [D, dims]
    vec_sq_norms: jax.Array,  # f32 [D] squared L2 norms
    mask: jax.Array,          # bool [D] (present & live & filter)
    queries: jax.Array,       # f32 [B, dims]
    *,
    similarity: str,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k. Returns (scores [B, k], doc_ids [B, k])."""
    scores = _scores(queries, vectors, vec_sq_norms, similarity)
    masked = jnp.where(mask[None, :], scores, -jnp.inf)
    return jax.lax.top_k(masked, k)


# ---------------------------------------------------------------------------
# IVF: coarse k-means partitioning for very large corpora
# ---------------------------------------------------------------------------


def kmeans_fit(
    vectors: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 0
) -> np.ndarray:
    """Simple k-means (device-side Lloyd iterations) -> centroids [C, dims]."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(vectors), size=n_clusters, replace=False)
    centroids = jnp.asarray(vectors[idx])
    data = jnp.asarray(vectors)

    @jax.jit
    def step(centroids):
        d = (
            jnp.sum(data * data, axis=1)[:, None]
            - 2.0 * data @ centroids.T
            + jnp.sum(centroids * centroids, axis=1)[None, :]
        )
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, centroids.shape[0], dtype=jnp.float32)
        sums = one_hot.T @ data
        counts = one_hot.sum(axis=0)[:, None]
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)

    for _ in range(iters):
        centroids = step(centroids)
    return np.asarray(centroids)


class IVFIndex:
    """Inverted-file vector index: probe top clusters, exact-score members.

    Device layout: vectors regrouped cluster-contiguously so probing a
    cluster is a contiguous slice (same trick as postings runs).
    """

    def __init__(self, vectors: np.ndarray, n_clusters: int, similarity: str,
                 seed: int = 0):
        self.similarity = similarity
        self.centroids = kmeans_fit(vectors, n_clusters, seed=seed)
        d = (
            np.sum(vectors * vectors, axis=1)[:, None]
            - 2.0 * vectors @ self.centroids.T
            + np.sum(self.centroids * self.centroids, axis=1)[None, :]
        )
        assign = np.argmin(d, axis=1)
        order = np.argsort(assign, kind="stable")
        self.doc_map = order.astype(np.int32)  # slot -> original doc
        grouped = vectors[order]
        self.vectors = jax.device_put(grouped.astype(np.float32))
        self.sq_norms = jax.device_put(
            np.sum(grouped * grouped, axis=1).astype(np.float32)
        )
        counts = np.bincount(assign, minlength=n_clusters)
        self.cluster_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        self.centroids_dev = jax.device_put(self.centroids.astype(np.float32))

    def search(self, queries: np.ndarray, k: int, nprobe: int = 8):
        """Approximate top-k via cluster probing (host-orchestrated)."""
        q = jnp.asarray(queries.astype(np.float32))
        c_sq = jnp.sum(self.centroids_dev * self.centroids_dev, axis=1)
        c_scores = _scores(q, self.centroids_dev, c_sq, "l2_norm")
        _, top_clusters = jax.lax.top_k(c_scores, nprobe)
        top_clusters = np.asarray(top_clusters)
        B = len(queries)
        out_scores = np.full((B, k), -np.inf, np.float32)
        out_ids = np.zeros((B, k), np.int32)
        # group queries by identical probe sets would batch better; simple loop
        # per query is fine off the serving hot path (flat knn uses knn_search)
        for b in range(B):
            slots = np.concatenate([
                np.arange(self.cluster_offsets[c], self.cluster_offsets[c + 1])
                for c in top_clusters[b]
            ])
            if len(slots) == 0:
                continue
            sub = np.asarray(self.vectors)[slots]
            sq = np.asarray(self.sq_norms)[slots]
            scores = np.asarray(
                _scores(q[b : b + 1], jnp.asarray(sub), jnp.asarray(sq), self.similarity)
            )[0]
            top = np.argsort(-scores, kind="stable")[:k]
            n = len(top)
            out_scores[b, :n] = scores[top]
            out_ids[b, :n] = self.doc_map[slots[top]]
        return out_scores, out_ids

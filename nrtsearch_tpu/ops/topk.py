"""Masked top-k selection over per-doc scores.

Equivalent of Lucene's priority-queue top-k collectors (TopScoreDocCollector /
the reference's RelevanceCollector and SortFieldCollector, server/search/
collectors/). ``jax.lax.top_k`` breaks ties in favor of lower indices, which
matches Lucene's ascending-docid tie-break within a segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("k",))
def masked_top_k(
    scores: jax.Array,  # f32 [B, D]
    mask: jax.Array,    # bool [B, D] (match AND live AND filter)
    *,
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (top_scores [B,k], top_ids [B,k], total_hits [B])."""
    masked = jnp.where(mask, scores, NEG_INF)
    top_scores, top_ids = jax.lax.top_k(masked, k)
    total_hits = jnp.sum(mask, axis=-1, dtype=jnp.int32)
    return top_scores, top_ids, total_hits


@functools.partial(jax.jit, static_argnames=("k", "ascending"))
def masked_top_k_by_key(
    keys: jax.Array,    # sort keys, f32/f64 [B, D]
    mask: jax.Array,    # bool [B, D]
    *,
    k: int,
    ascending: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k by an arbitrary sort key (SortFieldCollector equivalent).

    Missing/masked docs sort last. Tie-break is ascending doc id (top_k's
    lower-index preference).
    """
    sortable = -keys if ascending else keys
    sortable = jnp.where(mask, sortable, NEG_INF)
    top_keys, top_ids = jax.lax.top_k(sortable, k)
    total_hits = jnp.sum(mask, axis=-1, dtype=jnp.int32)
    real_keys = -top_keys if ascending else top_keys
    return real_keys, top_ids, total_hits

"""Masked Davies-Bouldin index in pure JAX.

The reference scores clustering quality with sklearn's
``davies_bouldin_score`` (/root/reference/spriteworld/tasks.py:207-215), which
is host-only. This reimplements the same statistic as fixed-shape masked
tensor algebra so it runs inside jit/vmap on TPU:

  DB = mean_i max_{j != i} (S_i + S_j) / ||mu_i - mu_j||

with S_i the mean distance of cluster i's members to its centroid mu_i.

Masking mirrors sklearn's LabelEncoder semantics: clusters with zero members
are dropped from both the max and the mean. sklearn raises when fewer than 2
clusters are present; inside jit we return NaN instead (callers can surface
that as an invalid-state flag).
"""

from __future__ import annotations

import jax.numpy as jnp

_ATOL = 1e-8  # np.allclose default used by sklearn's zero checks


def davies_bouldin_index(positions: jnp.ndarray,
                         member: jnp.ndarray) -> jnp.ndarray:
    """Davies-Bouldin index of a masked clustering.

    Args:
      positions: f32[K, D] point coordinates (padded rows allowed — they must
        simply not be members of any cluster).
      member: bool[K, C] cluster membership; each point belongs to at most
        one cluster.

    Returns:
      f32 scalar: the DB index; 0.0 when sklearn's degenerate-zero checks
      trigger; NaN when fewer than 2 clusters are present.
    """
    member_f = member.astype(positions.dtype)  # [K, C]
    counts = member_f.sum(axis=0)  # [C]
    present = counts > 0
    safe_counts = jnp.maximum(counts, 1.0)

    # Centroids: masked mean. The contraction is tiny (K x C x 2) — leave it
    # to the VPU via explicit sums rather than an MXU matmul.
    centroids = (member_f[:, :, None] * positions[:, None, :]).sum(0) \
        / safe_counts[:, None]  # [C, D]

    # Mean member->centroid distance per cluster.
    d = jnp.linalg.norm(
        positions[:, None, :] - centroids[None, :, :], axis=-1)  # [K, C]
    intra = (d * member_f).sum(0) / safe_counts  # [C]

    # Pairwise centroid distances.
    cdist = jnp.linalg.norm(
        centroids[:, None, :] - centroids[None, :, :], axis=-1)  # [C, C]

    pair_present = present[:, None] & present[None, :]
    off_diag = ~jnp.eye(member.shape[1], dtype=bool)
    relevant = pair_present & off_diag

    # sklearn short-circuits: all intra ~ 0, or all centroid distances ~ 0.
    intra_all_zero = jnp.all(jnp.where(present, jnp.abs(intra), 0.0) <= _ATOL)
    cdist_all_zero = jnp.all(
        jnp.where(relevant, jnp.abs(cdist), 0.0) <= _ATOL)

    safe_cdist = jnp.where(cdist == 0.0, jnp.inf, cdist)
    ratio = (intra[:, None] + intra[None, :]) / safe_cdist  # [C, C]
    # Restrict the row-max to present columns (absent clusters are dropped by
    # sklearn's label encoding). Ratios are >= 0, so 0 is a neutral floor —
    # and the i==i entry is 0 anyway (cdist diag -> inf).
    scores = jnp.max(jnp.where(pair_present, ratio, 0.0), axis=1)  # [C]
    num_present = present.sum()
    db = jnp.where(present, scores, 0.0).sum() / jnp.maximum(num_present, 1)

    db = jnp.where(intra_all_zero | cdist_all_zero, 0.0, db)
    return jnp.where(num_present >= 2, db, jnp.nan)

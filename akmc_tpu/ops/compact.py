"""Mask compaction tuned for this TPU runtime.

``jnp.nonzero(mask, size=K)`` lowers to a full-length log-depth cumsum
(s64 under x64 emulation) plus a full-length drop-mode scatter — measured
~6 ms/step for an (N = 37,650) mask inside the 5 nm superstep scan
(tools/probe_kcarry_ablate.py, round 3), independent of the mask's
producer.  ``compact_mask`` produces the IDENTICAL result (ascending
indices of set bits, -1 padded) from MXU-friendly pieces:

  * blocked inclusive prefix counts as one (nb, B) @ (B, B) f32 matmul
    against a static upper-triangular ones matrix (counts <= B < 2^24,
    exact in f32) plus a tiny (nb,) cumsum;
  * the k-th set index via searchsorted over the (N,) prefix-count
    vector — log-depth GATHER passes over a K-vector instead of a
    full-length scatter.

Values are bit-identical to jnp.nonzero: integer counts are exact in f32
and searchsorted(cum, k, 'left') is exactly the first position with
cum >= k, i.e. the k-th set bit.
"""

from __future__ import annotations

import jax.numpy as jnp

_B = 512


def prefix_count(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix count of a boolean vector as f32 (exact: integer
    counts below 2^24)."""
    n = mask.shape[0]
    if n >= 1 << 24:
        raise ValueError(
            f"prefix_count: N={n} >= 2^24 — f32 counts would lose exactness; "
            "use jnp.nonzero or a blocked f64 variant at this scale"
        )
    nb = -(-n // _B)
    m = jnp.zeros((nb * _B,), jnp.float32).at[:n].set(
        mask.astype(jnp.float32)
    ).reshape(nb, _B)
    tri = jnp.triu(jnp.ones((_B, _B), jnp.float32))   # tri[k, j] = 1, k <= j
    inner = m @ tri                                   # (nb, B) inclusive
    tot = inner[:, -1]
    offs = jnp.cumsum(tot) - tot                      # exclusive block offsets
    return (offs[:, None] + inner).reshape(-1)[:n]


def compact_mask(mask: jnp.ndarray, size: int):
    """Ascending indices of True entries, -1 padded to ``size`` — the
    ``jnp.nonzero(mask, size=size, fill_value=-1)[0]`` contract.

    Returns (idx int32 (size,), valid bool (size,)).
    """
    n = mask.shape[0]
    cum = prefix_count(mask)
    k = jnp.arange(1, size + 1, dtype=jnp.float32)
    idx = jnp.searchsorted(cum, k, side="left").astype(jnp.int32)
    valid = k <= cum[-1]
    return jnp.where(valid, jnp.clip(idx, 0, n - 1), -1), valid

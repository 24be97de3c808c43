"""Chunked offline-inference reshapes (parity: IPDnet/utils_.py:152-167)."""
from __future__ import annotations

import jax.numpy as jnp


def pad_segments(x, seg_len: int):
    """Pad the time axis (last dim = nt) to a multiple of seg_len."""
    nt = x.shape[-1]
    rem = (-nt) % seg_len
    if rem == 0:
        return x, nt
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
    return jnp.pad(x, pad), nt


def split_segments(x, seg_len: int):
    """(nb, nc, nf, nt) → (nb·nseg, nc, nf, seg_len): batch the chunks."""
    x, orig_nt = pad_segments(x, seg_len)
    nb, nc, nf, nt = x.shape
    nseg = nt // seg_len
    x = x.reshape(nb, nc, nf, nseg, seg_len)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))
    return x.reshape(nb * nseg, nc, nf, seg_len), orig_nt


def merge_segments(y, nb: int, orig_nt2: int):
    """Inverse stitch along the output frame axis: (nb·nseg, nt2, ...) →
    (nb, nseg·nt2, ...) cropped to the un-padded length."""
    nseg = y.shape[0] // nb
    y = y.reshape((nb, nseg) + y.shape[1:])
    y = y.reshape((nb, nseg * y.shape[2]) + y.shape[3:])
    return y[:, :orig_nt2]

"""IPD → DOA decoding on the spatial-spectrum grid.

TPU-native redesign of the reference's SourceDetectLocalize
(FN-SSL/Module.py:516-646): the spatial spectrum is one batched matmul on
the MXU, and both decoders are fully vectorized over (nb, nt) —
the reference's per-(batch, frame) python loops for template scaling (IDL)
and peak sorting (PD) become gathers and top-k.

Numerics match the reference exactly: spectrum divisor P·F/2, iterative
least-squares template subtraction, 8-neighbour peak detection with
circular azimuth and replicated elevation borders.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DecodeResult(NamedTuple):
    doa: jax.Array            # (nb, nt, 2, ns) radians (ele, azi)
    vad: jax.Array            # (nb, nt, ns) detection score
    spatial_spectrum: jax.Array  # (nb, nt, nele, nazi)


@jax.jit
def spatial_spectrum(pred_ipd: jax.Array, template: jax.Array) -> jax.Array:
    """(nb, nt, F, P) × (nele, nazi, F, P) → (nb, nt, nele, nazi).

    Reference: the torch.bmm at Module.py:535-537, divisor P·F/2.
    """
    nb, nt, f, p = pred_ipd.shape
    nele, nazi = template.shape[:2]
    flat_t = template.reshape(nele * nazi, f * p)
    ss = pred_ipd.reshape(nb, nt, f * p) @ flat_t.T / (p * f / 2)
    return ss.reshape(nb, nt, nele, nazi)


@functools.lru_cache(maxsize=None)
def _perm_indices(ns: int) -> tuple:
    import itertools

    return tuple(itertools.permutations(range(ns)))


@jax.jit
def track_associate(doa: jax.Array) -> jax.Array:
    """Frame-to-frame track association by permutation argmin — the
    reference's dormant ``track_enable`` branch (FN-SSL/Module.py:623-644)
    as a ``lax.scan`` over frames, vmapped over the batch.

    ``doa``: (nb, nt, 2, ns) stacked (ele, azi). Sequentially, frame
    t+1's tracks are reordered by the permutation minimizing the summed
    absolute difference to frame t's (already reordered) tracks; the
    azimuth row wraps via min(|d|, 2π−|d|). The reference deliberately
    leaves the VADs unpermuted ("vad needs to adjust with doa
    adjustment" — Module.py:622), which is replicated: callers permute
    only the DOAs.
    """
    ns = doa.shape[-1]
    perms = jnp.asarray(np.array(_perm_indices(ns), np.int32))

    def step(prev, cur):                    # prev, cur: (2, ns)
        cand = cur[:, perms]                # (2, n_perm, ns)
        d1 = jnp.abs(cand - prev[:, None, :])
        d2 = d1.at[1].set(2 * jnp.pi - d1[1])
        best = jnp.argmin(jnp.minimum(d1, d2).sum(axis=(0, 2)))
        out = cand[:, best, :]
        return out, out

    def assoc_one(seq):                     # (nt, 2, ns)
        _, rest = jax.lax.scan(step, seq[0], seq[1:])
        return jnp.concatenate([seq[:1], rest], axis=0)

    return jax.vmap(assoc_one)(doa)


@functools.partial(jax.jit,
                   static_argnames=("max_num_sources", "source_num_mode",
                                    "track"))
def idl_decode(pred_ipd: jax.Array, template: jax.Array,
               ele_candidate: jax.Array, azi_candidate: jax.Array,
               max_num_sources: int = 1,
               source_num_mode: str = "unkNum",
               track: bool = False) -> DecodeResult:
    """Iterative detection & localization (Module.py:546-580, vectorized).

    Per source: argmax of the spatial spectrum, least-squares scale of the
    best template against the residual IPD, subtract, repeat.
    VAD = LS ratio ('unkNum') or 1 ('kNum'). ``track=True`` reassociates
    tracks frame-to-frame (``track_associate``).
    """
    nb, nt, f, p = pred_ipd.shape
    nele, nazi = template.shape[:2]
    flat_t = template.reshape(nele * nazi, f * p)
    residual = pred_ipd.reshape(nb, nt, f * p)
    first_ss = None

    doas, vads = [], []
    for _ in range(max_num_sources):
        ss = residual @ flat_t.T / (p * f / 2)       # (nb, nt, G)
        if first_ss is None:
            first_ss = ss.reshape(nb, nt, nele, nazi)
        idx = jnp.argmax(ss, axis=-1)                # (nb, nt)
        ele_i, azi_i = idx // nazi, idx % nazi
        doas.append(jnp.stack([ele_candidate[ele_i],
                               azi_candidate[azi_i]], axis=-1))
        best = flat_t[idx]                           # (nb, nt, F·P) gather
        ratio = (jnp.sum(best * residual, -1)
                 / jnp.sum(best * best, -1))         # (nb, nt)
        residual = residual - ratio[..., None] * best
        vads.append(jnp.ones_like(ratio) if source_num_mode == "kNum"
                    else ratio)

    doa = jnp.stack(doas, axis=-1)                  # (nb, nt, 2, ns)
    if track:
        doa = track_associate(doa)
    return DecodeResult(doa, jnp.stack(vads, axis=-1), first_ss)


@functools.partial(jax.jit,
                   static_argnames=("max_num_sources", "source_num_mode",
                                    "track"))
def pd_decode(pred_ipd: jax.Array, template: jax.Array,
              ele_candidate: jax.Array, azi_candidate: jax.Array,
              max_num_sources: int = 2,
              source_num_mode: str = "unkNum",
              track: bool = False) -> DecodeResult:
    """Peak detection: strict 8-neighbour maxima on the (ele, azi) grid
    (Module.py:582-621), circular in azimuth (last redundant column
    dropped), replicated at the elevation borders; top-k peaks by value.

    Edge semantics: when fewer than ``max_num_sources`` peaks exist, the
    remaining slots take the largest non-peak cells with their (low)
    values as VAD scores (the reference's python version raises instead).
    """
    ss_full = spatial_spectrum(pred_ipd, template)   # (nb, nt, nele, nazi)
    ss = ss_full[..., :-1]                           # drop redundant azi

    up = jnp.concatenate([ss[:, :, :1], ss[:, :, :-1]], axis=2)
    down = jnp.concatenate([ss[:, :, 1:], ss[:, :, -1:]], axis=2)

    def wrap(a):  # circular azimuth neighbours
        left = jnp.concatenate([a[..., -1:], a[..., :-1]], axis=-1)
        right = jnp.concatenate([a[..., 1:], a[..., :1]], axis=-1)
        return left, right

    l, r = wrap(ss)
    ul, ur = wrap(up)
    dl, dr = wrap(down)
    peaks = ((ss > up) & (ss > down) & (ss > l) & (ss > r)
             & (ss > ul) & (ss > ur) & (ss > dl) & (ss > dr))

    nb, nt, nele, nazi_c = ss.shape
    masked = jnp.where(peaks, ss, -jnp.inf).reshape(nb, nt, -1)
    vals, idx = jax.lax.top_k(masked, max_num_sources)
    # fall back to raw values for non-peak slots
    raw = ss.reshape(nb, nt, -1)
    vals = jnp.where(jnp.isfinite(vals),
                     vals, jnp.take_along_axis(raw, idx, axis=-1))
    ele_i, azi_i = idx // nazi_c, idx % nazi_c
    doa = jnp.stack([ele_candidate[ele_i], azi_candidate[azi_i]],
                    axis=2)                          # (nb, nt, 2, ns)
    if track:
        doa = track_associate(doa)
    vad = (jnp.ones_like(vals) if source_num_mode == "kNum" else vals)
    return DecodeResult(doa, vad, ss_full)


@functools.partial(jax.jit,
                   static_argnames=("max_num_sources", "source_num_mode"))
def mse_decode(pred_ipd: jax.Array, template: jax.Array,
               ele_candidate: jax.Array, azi_candidate: jax.Array,
               max_num_sources: int = 1,
               source_num_mode: str = "unkNum") -> DecodeResult:
    """IPDnet2's decode variant (IPDnet2/Module.py:596-655): the spatial
    spectrum is the per-grid-point MSE between prediction and template
    (argmin instead of argmax), the detection score is that minimum MSE
    (smaller = more confident — consumers divide by the reference's
    0.2919 and threshold with an inverted comparator), and iterative
    source removal subtracts the best template *unscaled*.
    """
    nb, nt, f, p = pred_ipd.shape
    nele, nazi = template.shape[:2]
    flat_t = template.reshape(nele * nazi, f * p)
    residual = pred_ipd.reshape(nb, nt, f * p)
    first_ss = None
    doas, vads = [], []
    for _ in range(max_num_sources):
        diff = residual[:, :, None, :] - flat_t[None, None, :, :]
        ss = jnp.mean(diff * diff, axis=-1)          # (nb, nt, G)
        if first_ss is None:
            first_ss = ss.reshape(nb, nt, nele, nazi)
        idx = jnp.argmin(ss, axis=-1)
        ele_i, azi_i = idx // nazi, idx % nazi
        doas.append(jnp.stack([ele_candidate[ele_i],
                               azi_candidate[azi_i]], axis=-1))
        best = flat_t[idx]
        mse = jnp.mean((best - residual) ** 2, axis=-1)
        residual = residual - best
        vads.append(jnp.ones_like(mse) if source_num_mode == "kNum"
                    else mse)
    return DecodeResult(jnp.stack(doas, axis=-1),
                        jnp.stack(vads, axis=-1), first_ss)


def time_pool_ipd(pred_ipd: jax.Array, pool: int) -> jax.Array:
    """(nb, nt, F, P) → (nb, nt//pool, F, P) mean pooling
    (Lightning/Module.py:727-734)."""
    nb, nt, f, p = pred_ipd.shape
    t2 = nt // pool
    return pred_ipd[:, : t2 * pool].reshape(nb, t2, pool, f, p).mean(axis=2)


def template_ri(template: np.ndarray, fre_used) -> np.ndarray:
    """Complex (nele, nazi, nf, P) template → real/imag concat over used
    bins, the decode-side layout (Lightning/Module.py:711-713)."""
    sel = template[:, :, fre_used]
    return np.concatenate([sel.real, sel.imag], axis=2).astype(np.float32)

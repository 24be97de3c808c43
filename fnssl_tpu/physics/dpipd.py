"""Direct-path inter-channel phase difference (DP-IPD) templates & targets.

Far-field (`DPIPD`, parity: FN-SSL/Module.py:424-514) and near-field
(`DPIPD2`, parity: IPDnet2/Module.py:413-498) variants.

Sign conventions are preserved bit-for-bit, including the reference's
double negation in the per-frame path (ITD computed as (m1-m2) then
multiplied by an extra -1, Module.py:486-488 "!!!! delete -1"), which makes
template and targets share one sign. We implement that single effective
convention:

    IPD(f, doa) = exp(-1j * 2*pi * f * r(doa)·(loc[m2]-loc[m1]) / c)

Everything is vectorized (no per-mic python loops at runtime) and jit-able;
templates are built once per (grid, array) on host in float64-exact numpy to
match the reference's numpy computation, targets are pure jnp for use inside
the training step.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fnssl_tpu.core.pairs import pair_indices


def _doa_unit_vectors(ele, azi):
    """r(ele, azi): unit vector, ele from +z, azi in xy-plane. (...,3)."""
    x = np.sin(ele) * np.cos(azi)
    return np.stack([x,
                     np.sin(ele) * np.sin(azi),
                     np.broadcast_to(np.cos(ele), x.shape)], axis=-1)


class DPIPD:
    """Far-field DP-IPD template grid + per-frame target generator.

    Args mirror the reference ctor: ndoa_candidate=(nele, nazi),
    mic_location (nmic, 3), nf, fre_max, ch_mode, speed.
    The IPDnet variant's ``search_space_azi/ele`` ctor args are the
    ``azi_range``/``ele_range`` keywords here
    (reference: IPDnet/Module.py:330-345).
    """

    def __init__(self, ndoa_candidate: Sequence[int],
                 mic_location: np.ndarray, nf: int = 257,
                 fre_max: float = 8000.0, ch_mode: str = "M",
                 speed: float = 343.0,
                 ele_range: tuple[float, float] = (0.0, np.pi),
                 azi_range: tuple[float, float] = (-np.pi, np.pi)):
        self.mic_location = np.asarray(mic_location, np.float64)
        self.nf = nf
        self.fre_max = float(fre_max)
        self.speed = float(speed)
        self.ch_mode = ch_mode
        nmic = self.mic_location.shape[-2]
        self.first, self.second = pair_indices(nmic, ch_mode)

        nele, nazi = ndoa_candidate
        ele = np.linspace(ele_range[0], ele_range[1], nele)
        azi = np.linspace(azi_range[0], azi_range[1], nazi)
        r = _doa_unit_vectors(ele[:, None], azi[None, :])  # (nele,nazi,3)
        # pair baseline loc[second] - loc[first]: (P, 3)
        baseline = (self.mic_location[self.second]
                    - self.mic_location[self.first])
        itd = np.einsum("ead,pd->eap", r, baseline) / self.speed
        fre = np.linspace(0.0, self.fre_max, nf)
        ipd = -2.0 * np.pi * fre[None, None, :, None] * itd[:, :, None, :]
        # (nele, nazi, nf, P) complex64 — matches reference template layout
        self.template = np.exp(1j * ipd).astype(np.complex64)
        self.doa_candidate = [ele, azi]
        # host-numpy copies for jit consumers: captured as trace
        # constants, so they must NOT be device arrays (device-constant
        # fetches and complex64 transfers are unimplemented on some
        # backends, e.g. the axon TPU tunnel)
        self._baseline_j = baseline.astype(np.float32)
        self._fre_j = fre.astype(np.float32)

    def targets(self, source_doa: jax.Array) -> jax.Array:
        """Per-frame DP-IPD targets.

        Args:
          source_doa: (nb, nt, 2, ns) — (ele, azi) per frame per source
            (the reference forward's input layout, Module.py:464-465).
        Returns:
          (nb, nt, nf, P, ns) complex64 — reference output layout.
        """
        return _dpipd_targets(source_doa, self._baseline_j, self._fre_j,
                              self.speed)

    def __call__(self, source_doa=None):
        """Reference-compatible call: returns (template, targets, grid)."""
        tgt = None if source_doa is None else np.asarray(
            self.targets(jnp.asarray(source_doa)))
        return self.template, tgt, self.doa_candidate


@functools.partial(jax.jit, static_argnames=("speed",))
def _dpipd_targets(source_doa, baseline, fre, speed: float):
    ele = source_doa[:, :, 0, :]  # (nb, nt, ns)
    azi = source_doa[:, :, 1, :]
    r = jnp.stack([jnp.sin(ele) * jnp.cos(azi),
                   jnp.sin(ele) * jnp.sin(azi),
                   jnp.cos(ele)], axis=-1)  # (nb, nt, ns, 3)
    # reference: ITD = r·(loc[m1]-loc[m2])/c, then IPD = -2πf·ITD·(-1)
    # == -2πf · r·(loc[m2]-loc[m1])/c  (template convention)
    itd = jnp.einsum("btsd,pd->btsp", r, baseline) / speed
    ipd = (-2.0 * jnp.pi) * fre[None, None, None, :, None] \
        * itd[:, :, :, None, :]  # (nb, nt, ns, nf, P)
    out = jax.lax.complex(jnp.cos(ipd), jnp.sin(ipd))
    return jnp.transpose(out, (0, 1, 3, 4, 2))  # (nb, nt, nf, P, ns)


class DPIPD2:
    """Near-field DP-IPD: exact per-mic distances at (doa, distance).

    Parity: IPDnet2/Module.py:413-498. Per-frame targets use true
    propagation-path length differences: IPD = +2πf·(d2-d1)/c (the
    reference's double-negated convention at Module.py:471-474, consistent
    with the far-field template in the far-field limit). The *template*
    grid in the reference remains far-field with elevation pinned to π/2
    (Module.py:427-439); we reproduce that. Unlike the reference — which
    rebuilds the numpy template every training step
    (run_IPDnet2.py:271-276) — targets here are a jit-able function of the
    (optionally per-batch) array topology.
    """

    def __init__(self, ndoa_candidate: Sequence[int],
                 mic_location: np.ndarray, nf: int = 257,
                 fre_max: float = 8000.0, ch_mode: str = "M",
                 speed: float = 343.0,
                 ele_range: tuple[float, float] = (np.pi / 2, np.pi / 2),
                 azi_range: tuple[float, float] = (-np.pi, np.pi)):
        self.mic_location = np.asarray(mic_location, np.float64)
        self.nf = nf
        self.fre_max = float(fre_max)
        self.speed = float(speed)
        self.ch_mode = ch_mode
        nmic = self.mic_location.shape[-2]
        self.first, self.second = pair_indices(nmic, ch_mode)

        nele, nazi = ndoa_candidate
        ele = np.linspace(ele_range[0], ele_range[1], nele)
        azi = np.linspace(azi_range[0], azi_range[1], nazi)
        r = _doa_unit_vectors(ele[:, None], azi[None, :])  # (nele,nazi,3)
        baseline = (self.mic_location[self.second]
                    - self.mic_location[self.first])
        itd = np.einsum("ead,pd->eap", r, baseline) / self.speed
        fre = np.linspace(0.0, self.fre_max, nf)
        ipd = -2.0 * np.pi * fre[None, None, :, None] * itd[:, :, None, :]
        self.template = np.exp(1j * ipd).astype(np.complex64)
        self.doa_candidate = [ele, azi]

    def targets(self, source_doa: jax.Array, distance: jax.Array,
                mic_location: jax.Array | None = None) -> jax.Array:
        """Near-field per-frame targets.

        Args:
          source_doa: (nb, nt, 2, ns) (ele, azi) radians.
          distance: (nb, nt, ns) source range in meters.
          mic_location: optional per-batch (nb, nmic, 3) topology; defaults
            to the ctor topology.
        Returns:
          (nb, nt, nf, P, ns) complex64.
        """
        if mic_location is None:
            mic = self.mic_location.astype(np.float32)[None]
            mic = jnp.broadcast_to(jnp.asarray(mic),
                                   (source_doa.shape[0],) + mic.shape[1:])
        else:
            mic = mic_location
        fre = np.linspace(0.0, self.fre_max, self.nf).astype(np.float32)
        return _dpipd2_targets(source_doa, distance, mic,
                               self.first, self.second, fre, self.speed)


@functools.partial(jax.jit, static_argnames=("speed",))
def _dpipd2_targets(source_doa, distance, mic, first, second, fre,
                    speed: float):
    ele = source_doa[:, :, 0, :]
    azi = source_doa[:, :, 1, :]
    r = jnp.stack([jnp.sin(ele) * jnp.cos(azi),
                   jnp.sin(ele) * jnp.sin(azi),
                   jnp.cos(ele)], axis=-1)          # (nb, nt, ns, 3)
    src = r * distance[..., None]                    # (nb, nt, ns, 3)
    # distances to each mic: (nb, nt, ns, nmic)
    d = jnp.linalg.norm(src[:, :, :, None, :]
                        - mic[:, None, None, :, :], axis=-1)
    dd = jnp.take(d, second, axis=-1) - jnp.take(d, first, axis=-1)
    itd = dd / speed                                 # (nb, nt, ns, P)
    # reference sign: IPD = -2πf·ITD·(-1) = +2πf·(d2-d1)/c
    ipd = (2.0 * jnp.pi) * fre[None, None, None, :, None] \
        * itd[:, :, :, None, :]
    out = jax.lax.complex(jnp.cos(ipd), jnp.sin(ipd))
    return jnp.transpose(out, (0, 1, 3, 4, 2))

"""Periodic-orbit storage compression: temporal Fourier representation.

The reference stores the whole nonlinear orbit (lv x nsteps per rank) for
Floquet/UPO matvecs (core/matvec.f:200-236) and shipped a (bit-rotted) Fourier
compressor (core/fourier.f:23-88: FFT in time, energy-ranked mode selection to
99%, reconstruction at arbitrary t). This is that capability rebuilt
TPU-first: the compressed orbit lives in HBM as (2m+1, state) real cos/sin
coefficients; per-step reconstruction inside the Floquet scan is one small
GEMM (mode axis contracted on the MXU) instead of an nsteps-deep HBM buffer —
an O(nsteps/m) memory win for long periods.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FourierOrbit(NamedTuple):
    """Real cos/sin temporal Fourier representation of a periodic orbit.

    coeffs[0]   = temporal mean,
    coeffs[2i+1] = cos coefficient of harmonic k_idx[i],
    coeffs[2i+2] = sin coefficient of harmonic k_idx[i].
    """

    coeffs: jnp.ndarray   # (2m+1, ...state) real
    k_idx: jnp.ndarray    # (m,) int32 selected harmonics (>= 1)


def compress_orbit(orbit: jnp.ndarray, energy: float = 0.99,
                   max_modes: int | None = None) -> FourierOrbit:
    """Compress snapshots orbit (nsteps, ...state) covering exactly one period
    into the smallest harmonic set capturing `energy` of the fluctuation
    energy (reference: energy-ranked selection to 99%, core/fourier.f:23-88).
    Host-side (runs once per orbit)."""
    snaps = np.asarray(orbit)
    nsteps = snaps.shape[0]
    flat = snaps.reshape(nsteps, -1)
    F = np.fft.rfft(flat, axis=0) / nsteps          # (nsteps//2+1, N)
    mean = F[0].real
    nyq = F.shape[0] - 1
    # fluctuation energy per harmonic (one-sided doubling, Parseval)
    e_k = 2.0 * np.sum(np.abs(F[1:]) ** 2, axis=1)
    if nsteps % 2 == 0 and len(e_k) > 0:
        e_k[-1] *= 0.5                              # Nyquist not doubled
    order = np.argsort(-e_k)
    tot = e_k.sum()
    if tot == 0:
        sel = order[:0]
    else:
        cum = np.cumsum(e_k[order]) / tot
        m = int(np.searchsorted(cum, energy) + 1)
        if max_modes is not None:
            m = min(m, max_modes)
        sel = np.sort(order[:m] + 1)                # harmonic numbers
    rows = [mean]
    for k in sel:
        scale = 2.0 if not (nsteps % 2 == 0 and k == nyq) else 1.0
        rows.append(scale * F[k].real)
        rows.append(-scale * F[k].imag)
    coeffs = np.stack(rows).reshape((-1,) + snaps.shape[1:])
    return FourierOrbit(coeffs=jnp.asarray(coeffs, orbit.dtype),
                        k_idx=jnp.asarray(sel, jnp.int32))


def orbit_phase_weights(fo: FourierOrbit, j, nsteps: int) -> jnp.ndarray:
    """In-graph weight vector w(j) (2m+1,) with snapshot_j ~= w(j) . coeffs."""
    th = 2.0 * jnp.pi * fo.k_idx.astype(fo.coeffs.dtype) * j / nsteps
    return jnp.concatenate([
        jnp.ones((1,), fo.coeffs.dtype),
        jnp.stack([jnp.cos(th), jnp.sin(th)], axis=1).reshape(-1)])


def orbit_at(fo: FourierOrbit, j, nsteps: int) -> jnp.ndarray:
    """Reconstruct snapshot j (traced index) — one (2m+1)-length contraction."""
    w = orbit_phase_weights(fo, j, nsteps)
    return jnp.tensordot(w, fo.coeffs, axes=1)


def reconstruct_orbit(fo: FourierOrbit, nsteps: int) -> jnp.ndarray:
    """All nsteps snapshots (host-side convenience/testing)."""
    return jax.vmap(lambda j: orbit_at(fo, j, nsteps))(jnp.arange(nsteps))


def compression_ratio(fo: FourierOrbit, nsteps: int) -> float:
    return nsteps / fo.coeffs.shape[0]

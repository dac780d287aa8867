"""Nek5000 binary field-file ("#std" / .fNNNNN) reader and writer.

Interchange with the reference toolchain: nekStab reads/writes all state
through Nek5000's `load_fld`/`outpost` field files (SURVEY.md §2 "Checkpoint
I/O", core/IO.f) — base flows (BF_*), Krylov vectors (KRY*), eigenmodes
(dRe/dIm...). This module implements the public file format so users moving
from the reference can load their existing base flows/restarts here and
inspect our output with their existing tools (VisIt/ParaView readers).

Format (2D fields, as produced by Nek's mfo_outfld):
  - 132-byte ASCII header:
      '#std' wdsize nx ny nz nelo nelgt time cycle fid0 nfileoo rdcode ...
  - 4-byte float32 6.54321 endian tag
  - int32[nelo] global element ids (1-based)
  - data blocks per rdcode letter, per element, in file-element order:
      X: x[nxyz], y[nxyz] (,z)   U: u,v(,w)   P: p   T: t   S#: scalars
    values in wdsize precision; intra-element ordering ix fastest.

Arrays here are (E, n, n) with [e, i, j], i the x/r index — Nek's ix-fastest
flat order is the transpose of each element block.
"""

from __future__ import annotations

import numpy as np

ENDIAN_TAG = 6.54321


def _elem_to_nek(f: np.ndarray) -> np.ndarray:
    """(E, n, n) [e, ix, iy] -> (E, n*n) with ix fastest."""
    return np.ascontiguousarray(f.transpose(0, 2, 1)).reshape(f.shape[0], -1)


def _elem_from_nek(flat: np.ndarray, n: int) -> np.ndarray:
    return flat.reshape(-1, n, n).transpose(0, 2, 1)


def read_fld(path: str) -> dict:
    """Read a Nek5000 field file. Returns a dict with keys among
    'x','y','u','v','p','t','s' (each (E, n, n), file element order reordered
    by the element map to global ids), plus 'time', 'cycle', 'emap', 'n'."""
    with open(path, "rb") as fh:
        hdr = fh.read(132).decode("ascii", errors="replace")
        if not hdr.startswith("#std"):
            raise ValueError(f"not a Nek '#std' field file: {path}")
        tok = hdr.split()
        wdsize = int(tok[1])
        nx, ny, nz = int(tok[2]), int(tok[3]), int(tok[4])
        nelo, nelgt = int(tok[5]), int(tok[6])
        time_ = float(tok[7])
        cycle = int(tok[8])
        rdcode = tok[11]
        tag = np.fromfile(fh, dtype="<f4", count=1)[0]
        if abs(tag - ENDIAN_TAG) > 1e-4:
            raise ValueError("big-endian Nek files not supported yet "
                             f"(tag={tag})")
        if nz != 1:
            raise ValueError("3D field files not supported yet")
        if nx != ny:
            raise ValueError(f"anisotropic element dims {nx}x{ny}")
        emap = np.fromfile(fh, dtype="<i4", count=nelo)
        dt = "<f8" if wdsize == 8 else "<f4"
        nxyz = nx * ny

        def block(ncomp):
            raw = np.fromfile(fh, dtype=dt, count=ncomp * nxyz * nelo)
            # per element, components consecutive: (E, ncomp, nxyz)
            raw = raw.reshape(nelo, ncomp, nxyz)
            return [_elem_from_nek(raw[:, c], nx) for c in range(ncomp)]

        out = dict(time=time_, cycle=cycle, emap=emap, n=nx, nelgt=nelgt,
                   rdcode=rdcode, wdsize=wdsize)
        for ch in rdcode:
            if ch == "X":
                out["x"], out["y"] = block(2)
            elif ch == "U":
                out["u"], out["v"] = block(2)
            elif ch == "P":
                (out["p"],) = block(1)
            elif ch == "T":
                (out["t"],) = block(1)
            elif ch.isdigit():
                ns = int(ch)
                if ns:
                    out["s"] = block(ns)
            elif ch in ("S", " "):
                continue
    # reorder file elements into global-id order (emap is 1-based... but some
    # writers emit 0-based ids; normalize to 0-based ascending)
    base = emap.min()
    order = np.argsort(emap)
    for k in ("x", "y", "u", "v", "p", "t"):
        if k in out:
            out[k] = out[k][order]
    if "s" in out:
        out["s"] = [a[order] for a in out["s"]]
    out["emap"] = emap[order] - base
    return out


def write_fld(path: str, *, x=None, y=None, u=None, v=None, p=None, t=None,
              time: float = 0.0, cycle: int = 0, wdsize: int = 8,
              emap: np.ndarray | None = None) -> None:
    """Write a Nek5000 '#std' field file readable by the reference toolchain
    and standard visualization readers. Arrays (E, n, n)."""
    ref = next(a for a in (x, u, p, t) if a is not None)
    E, n, _ = ref.shape
    rdcode = ""
    if x is not None:
        rdcode += "X"
    if u is not None:
        rdcode += "U"
    if p is not None:
        rdcode += "P"
    if t is not None:
        rdcode += "T"
    hdr = (f"#std {wdsize} {n:2d} {n:2d}  1 {E:10d} {E:10d}"
           f"  {time:.13E} {cycle:9d}      0      1 {rdcode}").ljust(132)
    dt = "<f8" if wdsize == 8 else "<f4"
    if emap is None:
        emap = np.arange(1, E + 1)
    with open(path, "wb") as fh:
        fh.write(hdr.encode("ascii"))
        np.asarray([ENDIAN_TAG], dtype="<f4").tofile(fh)
        np.asarray(emap, dtype="<i4").tofile(fh)

        def block(comps):
            flat = np.stack([_elem_to_nek(np.asarray(c, float))
                             for c in comps], axis=1)  # (E, ncomp, nxyz)
            flat.astype(dt).tofile(fh)

        if x is not None:
            block([x, y])
        if u is not None:
            block([u, v])
        if p is not None:
            block([p])
        if t is not None:
            block([t])

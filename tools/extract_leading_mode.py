"""Extract the leading Ritz vector from a saved Arnoldi/KS factorization
(.npz with Q/H) into a velocity-field .npz usable as an Arnoldi start
vector (--seed-from in examples/cylinder_reference_gold.py).

  python tools/extract_leading_mode.py examples/_ks_direct_dt0.01.npz \
      examples/_seed_lead_dt0.01.npz [--imag]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ks_npz")
    ap.add_argument("out_npz")
    ap.add_argument("--imag", action="store_true")
    args = ap.parse_args()
    from nekstab_tpu.io.checkpoint import save_field
    with np.load(args.ks_npz) as z:
        Q = z["Q0"] if "Q0" in z.files else z["Q"]
        H = z["H"]
        m = int(z["m"])
    lam, V = np.linalg.eig(H[:m, :m])
    i = int(np.argmax(np.abs(lam)))
    v = np.tensordot(V[:, i], Q[:m], axes=(0, 0))
    mode = v.imag if args.imag else v.real
    nrm = float(np.sqrt((mode ** 2).sum()))
    save_field(args.out_npz, np.ascontiguousarray(mode / nrm),
               source=os.path.basename(args.ks_npz),
               ritz=complex(lam[i]).real)
    print(f"saved {args.out_npz} (|lambda|={abs(lam[i]):.6f})")


if __name__ == "__main__":
    main()

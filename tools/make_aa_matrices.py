"""Convert the published empirical amino-acid matrices shipped with the
reference (dat/*.dat: lower-triangle exchangeabilities + equilibrium
frequencies; these are standard published scientific constants — Dayhoff,
JTT, WAG, LG, mtREV24, ...) into paml_tpu/data/aa_matrices.npz.

Run once:  python tools/make_aa_matrices.py
"""
import os
import re

import numpy as np

DAT_DIR = "/root/reference/dat"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "paml_tpu", "data", "aa_matrices.npz")

# empirical S-matrix files usable as Empirical/Empirical_F models
MATRICES = ["dayhoff", "jones", "wag", "lg", "mtREV24", "mtmam", "mtArt",
            "MtZoa", "cpREV10", "cpREV64", "dayhoff-dcmut", "jones-dcmut"]
# distance matrices for aaDist models (incl. Grantham 1974 components)
DISTANCES = ["grantham", "miyata", "g1974c", "g1974a", "g1974p", "g1974v"]


def parse_sdat(path):
    """Parse: 19 lower-triangle rows (190 numbers) then 20 frequencies."""
    nums = []
    with open(path) as f:
        for line in f:
            # stop at comment-ish text after enough numbers
            toks = re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", line)
            if not toks and len(nums) >= 210:
                break
            if any(c.isalpha() for c in line.replace("e-", "").replace("E-", "")
                   .replace("e+", "")) and len(nums) >= 210:
                break
            nums.extend(float(t) for t in toks)
            if len(nums) >= 210:
                break
    if len(nums) < 210:
        raise ValueError(f"{path}: found only {len(nums)} numbers")
    tri = nums[:190]
    freqs = np.array(nums[190:210])
    S = np.zeros((20, 20))
    k = 0
    for i in range(1, 20):
        for j in range(i):
            S[i, j] = S[j, i] = tri[k]
            k += 1
    freqs = freqs / freqs.sum()
    return S, freqs


def parse_distance(path):
    """Distance matrices: lower triangle, no frequencies."""
    nums = []
    with open(path) as f:
        for line in f:
            toks = re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", line)
            nums.extend(float(t) for t in toks)
            if len(nums) >= 190:
                break
    D = np.zeros((20, 20))
    k = 0
    for i in range(1, 20):
        for j in range(i):
            D[i, j] = D[j, i] = nums[k]
            k += 1
    return D


def main():
    out = {}
    for name in MATRICES:
        path = os.path.join(DAT_DIR, f"{name}.dat")
        if not os.path.exists(path):
            print(f"skip {name} (not found)")
            continue
        try:
            S, pi = parse_sdat(path)
            out[f"{name}_S"] = S
            out[f"{name}_pi"] = pi
            print(f"{name}: ok (pi sum {pi.sum():.6f})")
        except Exception as e:
            print(f"skip {name}: {e}")
    for name in DISTANCES:
        path = os.path.join(DAT_DIR, f"{name}.dat")
        if os.path.exists(path):
            out[f"{name}_D"] = parse_distance(path)
            print(f"{name}: distance ok")
    np.savez_compressed(os.path.abspath(OUT), **out)
    print(f"wrote {os.path.abspath(OUT)} with {len(out)} arrays")


if __name__ == "__main__":
    main()

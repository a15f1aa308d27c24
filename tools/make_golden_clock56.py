"""Generate the clock 5/6 heterogeneous-dating fixture + golden numbers.

Simulates two nucleotide loci (different taxa subsets) on a dated
6-species tree under HKY with per-locus rates, writes
tests/data/clock56.nuc / clock56.trees, runs the reference baseml
(clock = 5 and clock = 6) on them, and records the reference lnL and
node ages in tests/golden_clock56.json.
"""
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from paml_tpu.core import simulate  # noqa: E402
from paml_tpu.core.pmat import pmat_tn93, tn93_alphas  # noqa: E402
from paml_tpu.core.topology import from_treenode  # noqa: E402
from paml_tpu.io import treeio  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "tests", "data")
os.makedirs(DATA, exist_ok=True)

SP_TREE = "((((A, B), C) '@0.45', (D, E)), F);"
AGES = {"AB": 0.15, "ABC": 0.45, "DE": 0.35, "ABCDE": 0.7, "ROOT": 1.0}
PI = np.array([0.3, 0.25, 0.2, 0.25])

LOCI = [
    dict(names=["A", "B", "C", "D", "E", "F"], rate=0.08, kappa=3.0, L=700),
    dict(names=["A", "B", "C", "D", "F"], rate=0.18, kappa=6.0, L=500),
]


def node_age(tipset):
    key = "".join(sorted(tipset))
    table = {"AB": 0.15, "ABC": 0.45, "DE": 0.35, "ABCDE": 0.7,
             "ABCDEF": 1.0}
    return table.get(key, 0.0)


def sim_locus(names, rate, kappa, L, seed):
    # prune the dated tree to `names` and set blens = dt * rate
    from paml_tpu.apps.clock56 import prune_to_taxa
    trees = treeio.parse_newick(SP_TREE)
    all_names = ["A", "B", "C", "D", "E", "F"]
    sp_topo = from_treenode(trees, all_names)
    desc_sp = sp_topo.tip_descendants()
    ages_sp = np.array([node_age({all_names[t] for t in desc_sp[n]})
                        for n in range(sp_topo.nnode)])
    g = prune_to_taxa(trees, set(names))
    topo = from_treenode(g, names)
    ipop = np.zeros(topo.nnode, dtype=int)
    for n in g.walk_pre():
        ipop[n.index] = n.sp_index
    ages = ages_sp[ipop]
    blen = np.zeros(topo.nnode)
    for n in range(topo.nnode):
        if n != topo.root:
            blen[n] = (ages[topo.parent[n]] - ages[n]) * rate
    a1, a2, b = tn93_alphas("HKY85", jnp.asarray(PI),
                            jnp.asarray([kappa, kappa]))
    P = pmat_tn93(jnp.asarray(PI), a1, a2, b, jnp.asarray(blen))
    key = jax.random.PRNGKey(seed)
    states, _ = simulate.simulate_states(key, topo, np.asarray(P)[:, None],
                                         PI, L)
    return names, simulate.states_to_rows(
        np.asarray(states)[:topo.ns], "TCAG")


def main():
    seqf = os.path.join(DATA, "clock56.nuc")
    treef = os.path.join(DATA, "clock56.trees")
    with open(treef, "w") as f:
        f.write("6 1\n\n" + SP_TREE + "\n")
    with open(seqf, "w") as f:
        for i, cfg in enumerate(LOCI):
            names, rows = sim_locus(cfg["names"], cfg["rate"], cfg["kappa"],
                                    cfg["L"], seed=11 + i)
            f.write(f" {len(names)} {cfg['L']}\n")
            for n, r in zip(names, rows):
                f.write(f"{n:<12s}  {r}\n")
            f.write("\n")

    golden = {}
    for clock in (5, 6):
        work = f"/tmp/clock56ref{clock}"
        os.makedirs(work, exist_ok=True)
        ctl = f"""
      seqfile = {seqf}
     treefile = {treef}
      outfile = mlb
        noisy = 3
      verbose = 0
        model = 4
        Mgene = 0
        ndata = 2
        clock = {clock}
    fix_kappa = 0
        kappa = 2
    fix_alpha = 1
        alpha = 0
       Malpha = 0
        ncatG = 5
        getSE = 0
 RateAncestor = 0
       method = 0
   Small_Diff = 1e-6
"""
        with open(os.path.join(work, "baseml.ctl"), "w") as f:
            f.write(ctl)
        r = subprocess.run(["/tmp/pamlbuild/src/baseml_g", "baseml.ctl"],
                           cwd=work, stdin=subprocess.DEVNULL,
                           capture_output=True, text=True, timeout=3600)
        out = open(os.path.join(work, "mlb")).read()
        m = re.search(r"lnL\(ntime:\s*\d+\s+np:\s*(\d+)\):\s*([-\d.]+)", out)
        np_ref, lnl = int(m.group(1)), float(m.group(2))
        # node ages from the TreeView tree: ... internal ages via output
        # 'Substititon rates for genes'
        rates = []
        mrate = re.search(r"Subst\w* rates for genes[^\n]*\n((?:\s*Gene[^\n]*\n)+)", out)
        for line in mrate.group(1).strip().splitlines():
            rates.append([float(v) for v in re.findall(r"[\d.]+(?:[eE][+-]?\d+)?", line)[1:]])
        kappas = []
        mk = re.search(r"kappa for genes\s*\n([^\n]+)", out)
        if mk:
            kappas = [float(v) for v in mk.group(1).split()]
        golden[f"clock{clock}"] = dict(lnL=lnl, np=np_ref, rates=rates,
                                       kappa=kappas)
        print(f"clock{clock}: lnL={lnl} np={np_ref} rates={rates} "
              f"kappa={kappas}", file=sys.stderr)
        print(r.stdout[-600:], file=sys.stderr)

    with open(os.path.join(DATA, "..", "golden_clock56.json"), "w") as f:
        json.dump(golden, f, indent=1)


if __name__ == "__main__":
    main()

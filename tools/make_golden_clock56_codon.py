"""Generate the codon clock 5/6 heterogeneous-dating fixture + goldens.

Simulates two codon loci (different taxa subsets) on the same dated
6-species tree as the nucleotide fixture, under M0 with per-locus rate /
kappa / omega and equal codon frequencies, writes
tests/data/clock56.codon, runs the reference codeml (clock = 5 and 6;
built with the GenerateGtree_locus gnodes allocation enabled outside
MCMCTREE, as for the baseml golden) and records lnL / rates / kappa /
omega in tests/golden_clock56_codon.json.
"""
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from paml_tpu.core import simulate  # noqa: E402
from paml_tpu.core.pmat import pmat_rev  # noqa: E402
from paml_tpu.core.topology import from_treenode  # noqa: E402
from paml_tpu.io import treeio  # noqa: E402
from paml_tpu.models import codon as codonmod  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "tests", "data")
CODEML_G = "/tmp/pamlbuild2/src/codeml"

SP_TREE = "((((A, B), C) '@0.45', (D, E)), F);"

LOCI = [
    dict(names=["A", "B", "C", "D", "E", "F"], rate=0.05, kappa=3.0,
         omega=0.2, L=300),
    dict(names=["A", "B", "C", "D", "F"], rate=0.12, kappa=5.0,
         omega=0.6, L=200),
]


def node_age(tipset):
    table = {"AB": 0.15, "ABC": 0.45, "DE": 0.35, "ABCDE": 0.7,
             "ABCDEF": 1.0}
    return table.get("".join(sorted(tipset)), 0.0)


def sim_locus(names, rate, kappa, omega, L, seed):
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
    graph = codonmod.codon_graph(0)
    pi = jnp.full((graph.n,), 1.0 / graph.n)
    s = codonmod.mutation_part(graph, kappa)
    Q = codonmod.build_Q(graph, s, omega, pi)
    mr = codonmod.mean_rate(graph, s, omega, pi)
    P = pmat_rev(Q, pi, jnp.asarray(blen) / mr)
    key = jax.random.PRNGKey(seed)
    states, _ = simulate.simulate_states(key, topo, np.asarray(P)[:, None],
                                         np.asarray(pi), L)
    codons = ["".join("TCAG"[c] for c in row) for row in graph.pos_nt]
    rows = ["".join(codons[s_] for s_ in seq)
            for seq in np.asarray(states)[:topo.ns]]
    return names, rows


def main():
    seqf = os.path.join(DATA, "clock56.codon")
    treef = os.path.join(DATA, "clock56.trees")
    with open(seqf, "w") as f:
        for i, cfg in enumerate(LOCI):
            names, rows = sim_locus(cfg["names"], cfg["rate"], cfg["kappa"],
                                    cfg["omega"], cfg["L"], seed=31 + i)
            f.write(f" {len(names)} {cfg['L'] * 3}\n")
            for n, r in zip(names, rows):
                f.write(f"{n:<12s}  {r}\n")
            f.write("\n")

    golden = {}
    for clock in (5, 6):
        work = f"/tmp/clock56refc{clock}"
        os.makedirs(work, exist_ok=True)
        ctl = f"""
      seqfile = {seqf}
     treefile = {treef}
      outfile = mlc
        noisy = 3
      verbose = 0
      seqtype = 1
    CodonFreq = 0
        ndata = 2
        clock = {clock}
        model = 0
      NSsites = 0
        icode = 0
    fix_kappa = 0
        kappa = 2
    fix_omega = 0
        omega = 0.4
    fix_alpha = 1
        alpha = 0
        ncatG = 5
        getSE = 0
 RateAncestor = 0
       method = 0
   Small_Diff = 1e-6
    cleandata = 0
"""
        with open(os.path.join(work, "codeml.ctl"), "w") as f:
            f.write(ctl)
        r = subprocess.run([CODEML_G, "codeml.ctl"], cwd=work,
                           stdin=subprocess.DEVNULL, capture_output=True,
                           text=True, timeout=3600)
        out = open(os.path.join(work, "mlc")).read()
        m = re.search(r"lnL\(ntime:\s*\d+\s+np:\s*(\d+)\):\s*([-\d.]+)", out)
        np_ref, lnl = int(m.group(1)), float(m.group(2))
        rates = []
        mrate = re.search(
            r"Subst\w* rates for genes[^\n]*\n((?:\s*Gene[^\n]*\n)+)", out)
        for line in mrate.group(1).strip().splitlines():
            rates.append([float(v) for v in
                          re.findall(r"[\d.]+(?:[eE][+-]?\d+)?", line)[1:]])
        kappas = [float(v) for v in re.search(
            r"kappa for genes\s*\n([^\n]+)", out).group(1).split()]
        omegas = [float(v) for v in re.search(
            r"omega for genes\s*\n([^\n]+)", out).group(1).split()]
        golden[f"clock{clock}"] = dict(lnL=lnl, np=np_ref, rates=rates,
                                       kappa=kappas, omega=omegas)
        print(f"clock{clock}: lnL={lnl} np={np_ref} rates={rates} "
              f"kappa={kappas} omega={omegas}", file=sys.stderr)
        print(r.stdout[-400:], file=sys.stderr)

    with open(os.path.join(DATA, "..", "golden_clock56_codon.json"), "w") as f:
        json.dump(golden, f, indent=1)


if __name__ == "__main__":
    main()

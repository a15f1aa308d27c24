"""evolver: sequence simulation and tree utilities.

Counterpart of the reference program (src/evolver.c): simulates
nucleotide (JC69..REV+Gamma), codon (M0 / site models), and amino-acid
alignments on a fixed tree, reading the positional .dat configuration
files (examples/MCbase.dat, MCcodon.dat, MCaa.dat; reference parser:
Simulate, src/evolver.c:818).

Modes (matching the reference menu numbers / CLI):
  5 <file>  simulate nucleotide data
  6 <file>  simulate codon data
  7 <file>  simulate amino-acid data
"""
from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AA_ORDER, NUC_ORDER, codon_string, sense_codons
from ..core.dgamma import discrete_gamma
from ..core.pmat import pmat_rev
from ..core.simulate import simulate_states, states_to_rows, write_paml_seqs
from ..core.topology import Topology, from_treenode
from ..io.treeio import parse_newick
from ..models import aa as aamod
from ..models import codon as codonmod
from ..models import nuc as nucmod


def _tokens(path: str):
    """Positional tokens from a .dat file: numbers/strings line by line,
    stopping at the '// end of file' or '====' note separator."""
    toks = []
    tree_lines = []
    with open(path) as f:
        text = f.read()
    for sep in ("// end of file", "===", "!!"):
        idx = text.find(sep)
        if idx > 0:
            text = text[:idx]
    # extract tree(s) first (lines containing parentheses up to ';')
    trees = re.findall(r"\([^;]*\)[^;]*;", text, flags=re.S)
    text_wo = re.sub(r"\([^;]*\)[^;]*;", " ", text, flags=re.S)
    for line in text_wo.splitlines():
        for cc in ("*",):
            i = line.find(cc)
            if i >= 0:
                line = line[:i]
        toks.extend(line.split())
    return toks, trees


class _Tok:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def num(self):
        while self.i < len(self.toks):
            t = self.toks[self.i]
            self.i += 1
            try:
                return float(t)
            except ValueError:
                continue
        raise ValueError("ran out of numeric tokens in .dat file")

    def nums(self, k):
        return [self.num() for _ in range(k)]

    def str_tok(self):
        t = self.toks[self.i]
        self.i += 1
        return t


def _prepare_tree(tree_str: str, ns: int, tree_length: float):
    names = []
    tree = parse_newick(tree_str)
    tips = [n for n in tree.walk_post() if n.is_tip]
    for t in tips:
        names.append(t.name)
    topo = from_treenode(tree, names)
    blens = topo.blen0.copy()
    if tree_length > 0:
        s = blens.sum()
        blens = blens * (tree_length / s)
    return topo, names, blens


def simulate_nuc(datfile: str, out="mc.paml", seed=None):
    toks, trees = _tokens(datfile)
    tk = _Tok(toks)
    outfmt = int(tk.num())
    seed_f = int(tk.num())
    ns, ls, nrepl = (int(v) for v in tk.nums(3))
    tree_length = tk.num()
    model_i = int(tk.num())
    model = nucmod.NUC_MODELS[model_i]
    nr = nucmod.N_RATE_PARAMS[model]
    rates = np.array(tk.nums(nr)) if nr else np.zeros(0)
    alpha = tk.num()
    ncatG = int(tk.num())
    pi = np.array(tk.nums(4))
    pi = pi / pi.sum()

    topo, names, blens = _prepare_tree(trees[0], ns, tree_length)
    key = jax.random.PRNGKey(seed if seed is not None else abs(seed_f))

    if alpha > 0 and ncatG > 1:
        r, w = discrete_gamma(jnp.asarray(alpha), ncatG)
    else:
        r, w = jnp.ones((1,)), jnp.ones((1,))
    K = len(r)
    ts = jnp.asarray(blens)[:, None] * r[None, :]
    P, pi_root = nucmod.pmats_for_model(
        model, jnp.asarray(rates), jnp.asarray(pi), ts)

    with open(out, "w") as f:
        for rep in range(nrepl):
            key, k = jax.random.split(key)
            states, _ = simulate_states(k, topo, P, pi_root, ls, w)
            rows = states_to_rows(np.asarray(states[:topo.ns]), NUC_ORDER)
            write_paml_seqs(f, names, rows)
    return out, nrepl


def simulate_codon(datfile: str, out="mc.paml", seed=None):
    toks, trees = _tokens(datfile)
    tk = _Tok(toks)
    outfmt = int(tk.num())
    seed_f = int(tk.num())
    ns, ncod, nrepl = (int(v) for v in tk.nums(3))
    tree_length = tk.num()
    omega = tk.num()
    kappa = tk.num()
    f64 = np.array(tk.nums(64))
    icode = int(tk.num())
    sense = sense_codons(icode)
    pi = f64[sense]
    pi = pi / pi.sum()

    topo, names, blens = _prepare_tree(trees[0], ns, tree_length)
    key = jax.random.PRNGKey(seed if seed is not None else abs(seed_f))
    graph = codonmod.codon_graph(icode)
    s = codonmod.mutation_part(graph, jnp.asarray(kappa))
    Q = codonmod.build_Q(graph, s, jnp.asarray(omega), jnp.asarray(pi))
    mr = codonmod.mean_rate(graph, s, jnp.asarray(omega), jnp.asarray(pi))
    ts = (jnp.asarray(blens) / mr)[:, None]          # [nnode, 1]
    P = pmat_rev(Q, jnp.asarray(pi), ts)             # [nnode, 1, n, n]

    alphabet = [codon_string(c) for c in sense]
    with open(out, "w") as f:
        for rep in range(nrepl):
            key, k = jax.random.split(key)
            states, _ = simulate_states(k, topo, P, jnp.asarray(pi), ncod)
            rows = states_to_rows(np.asarray(states[:topo.ns]), alphabet)
            write_paml_seqs(f, names, rows)
    return out, nrepl


def simulate_aa(datfile: str, out="mc.paml", seed=None):
    toks, trees = _tokens(datfile)
    tk = _Tok(toks)
    outfmt = int(tk.num())
    seed_f = int(tk.num())
    ns, ls, nrepl = (int(v) for v in tk.nums(3))
    tree_length = tk.num()
    alpha = tk.num()
    ncatG = int(tk.num())
    model_i = int(tk.num())
    rate_file = None
    if model_i in (2, 3):
        rate_file = tk.str_tok()
    pi = np.array(tk.nums(20))
    pi = pi / pi.sum()

    topo, names, blens = _prepare_tree(trees[0], ns, tree_length)
    key = jax.random.PRNGKey(seed if seed is not None else abs(seed_f))
    if model_i == 0:
        S = np.ones((20, 20))
    else:
        S, _ = aamod.load_empirical(rate_file or "jones")
    Q = aamod.build_aa_Q(S, pi)
    if alpha > 0 and ncatG > 1:
        r, w = discrete_gamma(jnp.asarray(alpha), ncatG)
    else:
        r, w = jnp.ones((1,)), jnp.ones((1,))
    ts = jnp.asarray(blens)[:, None] * r[None, :]
    P = pmat_rev(Q, jnp.asarray(pi), ts)

    with open(out, "w") as f:
        for rep in range(nrepl):
            key, k = jax.random.split(key)
            states, _ = simulate_states(k, topo, P, jnp.asarray(pi), ls, w)
            rows = states_to_rows(np.asarray(states[:topo.ns]), AA_ORDER)
            write_paml_seqs(f, names, rows)
    return out, nrepl


def main(argv):
    """Modes mirror the reference evolver menu (src/evolver.c:159-168):
    1/2 random unrooted/rooted trees, 3/4 list all unrooted/rooted trees,
    5/6/7 simulate nuc/codon/aa data, 8 partition distances between
    trees."""
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    mode = argv[0]
    if mode in ("1", "2"):
        from . import treegen
        from ..io.treeio import write_newick
        import numpy as np
        ns = int(argv[1])
        ntree = int(argv[2]) if len(argv) > 2 else 1
        seed = int(argv[3]) if len(argv) > 3 else 1
        bd = [float(v) for v in argv[4:8]]  # birth death sample mut
        rng = np.random.default_rng(seed)
        out = "evolver.out"
        with open(out, "w") as f:
            for _ in range(ntree):
                if bd:
                    t = treegen.random_tree_bd(
                        ns, rooted=(mode == "2"), birth=bd[0], death=bd[1],
                        sample=bd[2], mut=bd[3], rng=rng)
                else:
                    t, _h = treegen.random_labeled_history(
                        ns, rooted=(mode == "2"), rng=rng)
                f.write(write_newick(t, branch_lengths=bool(bd)) + "\n")
        print(f"{ntree} random {'rooted' if mode == '2' else 'unrooted'} "
              f"tree(s) -> {out}")
        return
    if mode in ("3", "4"):
        from . import treegen
        from ..io.treeio import write_newick
        ns = int(argv[1])
        out = "evolver.out"
        n = 0
        with open(out, "w") as f:
            for t in treegen.list_trees(ns, rooted=(mode == "4")):
                f.write(write_newick(t, branch_lengths=False) + "\n")
                n += 1
        print(f"{n} {'rooted' if mode == '4' else 'unrooted'} trees -> "
              f"{out}")
        return
    if mode == "8":
        from . import treegen
        sh, rf = treegen.tree_distances_file(argv[1])
        n = len(sh)
        print("pairwise (shared partitions, partition distance):")
        for i in range(n):
            print(" ".join(f"{sh[i, j]}/{rf[i, j]}" for j in range(n)))
        return
    datfile = argv[1]
    out = argv[2] if len(argv) > 2 else "mc.paml"
    fn = {"5": simulate_nuc, "6": simulate_codon, "7": simulate_aa}.get(mode)
    if fn is None:
        print(f"unknown evolver mode {mode}; use 1-4 (trees), 5 (nuc), "
              "6 (codon), 7 (aa), 8 (distances)")
        sys.exit(2)
    path, nrepl = fn(datfile, out)
    print(f"simulated {nrepl} replicate(s) -> {path}")

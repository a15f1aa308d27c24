"""Sequence simulation down a tree (the evolver core).

Replaces the reference's recursive `Evolve` (src/evolver.c:753) with
vectorized categorical sampling over sites: states propagate root-to-tips
in preorder; each branch samples child states from the parent-conditional
rows of P(t), with per-site rate/omega classes selecting the class axis
(reference: Rates4Sites / MultiNomialAlias sampling, src/tools.c:695,1972
— JAX's categorical replaces the alias tables).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology


def simulate_states(key, topo: Topology, P, root_pi, nsites: int,
                    class_probs=None):
    """Simulate states at all nodes.

    P: [nnode, C, n, n]; root_pi: [n]; class_probs: [C] or None.
    Returns (states [nnode, nsites] int32, site_class [nsites]).
    """
    n = P.shape[-1]
    C = P.shape[1]
    key, k_cls, k_root = jax.random.split(key, 3)
    if class_probs is None or C == 1:
        site_class = jnp.zeros((nsites,), jnp.int32)
    else:
        site_class = jax.random.categorical(
            k_cls, jnp.log(jnp.asarray(class_probs))[None, :],
            shape=(nsites,)).astype(jnp.int32)

    states = jnp.zeros((topo.nnode, nsites), jnp.int32)
    root_states = jax.random.categorical(
        k_root, jnp.log(jnp.asarray(root_pi))[None, :],
        shape=(nsites,)).astype(jnp.int32)
    states = states.at[topo.root].set(root_states)

    # preorder: parents before children
    order = [topo.root]
    for i in order:
        for c in topo.children[i]:
            if c >= 0:
                order.append(int(c))
    for node in order[1:]:
        parent = int(topo.parent[node])
        key, k = jax.random.split(key)
        rows = P[node, site_class, states[parent]]        # [nsites, n]
        new = jax.random.categorical(
            k, jnp.log(jnp.maximum(rows, 1e-300))).astype(jnp.int32)
        states = states.at[node].set(new)
    return states, site_class


def states_to_rows(states_tips: np.ndarray, alphabet: str | list[str]):
    """Integer states -> character strings per taxon."""
    out = []
    for row in states_tips:
        out.append("".join(alphabet[s] for s in row))
    return out


def write_paml_seqs(path_or_f, names, rows, append=False):
    """Write a PAML/PHYLIP sequential alignment."""
    close = False
    if isinstance(path_or_f, str):
        f = open(path_or_f, "a" if append else "w")
        close = True
    else:
        f = path_or_f
    f.write(f" {len(names)} {len(rows[0])}\n")
    for nm, r in zip(names, rows):
        f.write(f"{nm:<20s}  {r}\n")
    f.write("\n")
    if close:
        f.close()

"""Sharded execution == replicated execution, on the 8-device CPU mesh.

SURVEY.md section 4: multi-device tests must assert equality of the
psum'd lnL against the single-host value.  The pattern axis is pure data
parallelism, so up to reduction reassociation the sharded value must match
the replicated one to tight tolerance (exact arithmetic here: x64 on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import baseml as baseml_app
from paml_tpu.apps import codeml as codeml_app
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio
from paml_tpu.parallel.sharding import (data_mesh, pad_patterns, replicate,
                                        shard_data)

BROWN = (conftest.ref_path("examples", "brown.nuc"),
         conftest.ref_path("examples", "brown.trees"))
ABG = (conftest.ref_path("examples", "abglobin.nuc"),
       conftest.ref_path("examples", "abglobin.trees"))


def _mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return data_mesh(jax.devices()[:8])


def test_codon_lnl_sharded_equals_replicated():
    aln = seqio.read_alignment(ABG[0], 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    trees = treeio.read_trees(ABG[1], data.names)
    topo = from_treenode(trees[0], data.names)
    spec = codeml_app.CodemlSpec(NSsites=3, ncatG=3, cleandata=True)
    neg_lnl, unpack, classes_for, x0, bounds, pi = \
        codeml_app.make_codon_objective(data, topo, spec)
    x = jnp.asarray(x0)
    v_rep = float(jax.jit(neg_lnl)(x))

    mesh = _mesh()
    tips_s, fpatt_s = shard_data(mesh, data.tip_partials, data.fpatt)
    xs = replicate(mesh, x)
    with mesh:
        v_shard = float(jax.jit(neg_lnl.with_data)(xs, tips_s, fpatt_s))
    assert abs(v_shard - v_rep) <= 1e-6 * max(1.0, abs(v_rep))


def test_codon_grad_sharded_equals_replicated():
    aln = seqio.read_alignment(ABG[0], 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    trees = treeio.read_trees(ABG[1], data.names)
    topo = from_treenode(trees[0], data.names)
    spec = codeml_app.CodemlSpec(cleandata=True)
    neg_lnl, *_r = codeml_app.make_codon_objective(data, topo, spec)
    x0 = _r[2]
    x = jnp.asarray(x0)
    g_rep = np.asarray(jax.jit(jax.grad(neg_lnl))(x))

    mesh = _mesh()
    tips_s, fpatt_s = shard_data(mesh, data.tip_partials, data.fpatt)
    xs = replicate(mesh, x)
    with mesh:
        g_sh = np.asarray(jax.jit(jax.grad(
            lambda p: neg_lnl.with_data(p, tips_s, fpatt_s)))(xs))
    np.testing.assert_allclose(g_sh, g_rep, rtol=1e-9, atol=1e-9)


def test_pad_patterns_is_exact():
    rng = np.random.default_rng(0)
    tp = rng.uniform(0, 1, size=(5, 13, 4))
    fp = rng.integers(1, 9, size=13).astype(float)
    tp2, fp2 = pad_patterns(tp, fp, 8)
    assert tp2.shape[1] == 16 and fp2.shape[0] == 16
    assert (fp2[13:] == 0).all() and (tp2[:, 13:, :] == 1).all()


def test_baseml_lnl_sharded_equals_replicated():
    aln = seqio.read_alignment(BROWN[0], 0)
    data = seqio.pack(aln, cleandata=True)
    trees = treeio.read_trees(BROWN[1], data.names)
    topo = from_treenode(trees[0], data.names)
    spec = baseml_app.BasemlSpec(model="HKY85", cleandata=True)
    neg_lnl, unpack, x0, bounds = baseml_app.make_objective(data, topo, spec)
    x = jnp.asarray(np.asarray(x0, float))
    v_rep = float(jax.jit(neg_lnl)(x))

    if not hasattr(neg_lnl, "with_data"):
        pytest.skip("baseml objective lacks with_data")
    mesh = _mesh()
    tips_s, fpatt_s = shard_data(mesh, data.tip_partials, data.fpatt)
    xs = replicate(mesh, x)
    with mesh:
        v_shard = float(jax.jit(neg_lnl.with_data)(xs, tips_s, fpatt_s))
    assert abs(v_shard - v_rep) <= 1e-6 * max(1.0, abs(v_rep))

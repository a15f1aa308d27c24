"""Two-process jax.distributed execution (SURVEY.md section 5.8).

Each process gets 4 virtual CPU devices; the global mesh spans 8 devices
across both processes; the abglobin M0 codon lnL + gradient computed on
the cross-process pattern-sharded mesh must equal the replicated
single-process value (psum over the process boundary).
"""
import os
import socket
import subprocess
import sys

import pytest

import conftest  # noqa: F401

_WORKER = r'''
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from paml_tpu.parallel import distributed as dist
dist.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc
import numpy as np, jax.numpy as jnp
from paml_tpu.apps import codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio
from paml_tpu.parallel.sharding import replicate, shard_data_multihost
REF = "/root/reference/examples"
aln = seqio.read_alignment(f"{REF}/abglobin.nuc", 1)
data = seqio.pack(aln, cleandata=True, icode=0)
topo = from_treenode(
    treeio.read_trees(f"{REF}/abglobin.trees", data.names)[0], data.names)
neg, *_r = codeml.make_codon_objective(
    data, topo, codeml.CodemlSpec(cleandata=True))
x0 = _r[2]
mesh = dist.global_data_mesh()
tips_g, fp_g = shard_data_multihost(mesh, data.tip_partials, data.fpatt)
x = replicate(mesh, jnp.asarray(x0))

def obj(p, t, f):
    return neg.with_data(p, t, f)

with mesh:
    v = jax.jit(obj)(x, tips_g, fp_g)
    g = jax.jit(jax.grad(obj, argnums=0))(x, tips_g, fp_g)
val = float(np.asarray(v.addressable_shards[0].data))
gn = float(np.linalg.norm(np.asarray(g.addressable_shards[0].data)))
v1 = jax.jit(neg)(jnp.asarray(x0))
v1 = float(np.asarray(v1.addressable_shards[0].data))
if pid == 0:
    print(f"MULTIHOST {val:.9f} {v1:.9f} {gn:.6f}", flush=True)
assert abs(val - v1) <= 1e-8 * abs(v1), (val, v1)
'''


@pytest.mark.slow
def test_two_process_distributed_lnl(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    # the subprocesses must NOT inherit the suite's 8-vdev XLA_FLAGS
    env["XLA_FLAGS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    line = next(ln for ln in outs[0].splitlines()
                if ln.startswith("MULTIHOST"))
    _tag, val, v1, _gn = line.split()
    assert abs(float(val) - float(v1)) <= 1e-8 * abs(float(v1))

"""ML clock-model golden tests (reference baseml clock=1/2 on brown.nuc).

clock=1 values from running reference baseml on brown.rooted.trees (K80);
clock=2 from a labeled rooted tree ((((1,2) #1,3),4),5).
"""
import numpy as np
import pytest

from paml_tpu.apps import baseml

from conftest import ref_path

BROWN = ref_path("examples", "brown.nuc")


@pytest.mark.parametrize("tree_index,lnl", [(0, -2749.218349),
                                            (1, -2759.489249),
                                            (2, -2758.621146)])
def test_global_clock(tree_index, lnl):
    res = baseml.fit(BROWN, ref_path("examples", "brown.rooted.trees"),
                     baseml.BasemlSpec(model="K80", clock=1, cleandata=True),
                     tree_index=tree_index)
    assert res.np == 5
    np.testing.assert_allclose(res.lnL, lnl, atol=1e-4)


def test_local_clock(tmp_path):
    tf = tmp_path / "t.trees"
    tf.write_text(" 5 1\n((((1,2) #1,3),4),5);\n")
    res = baseml.fit(BROWN, str(tf),
                     baseml.BasemlSpec(model="K80", clock=2, cleandata=True))
    assert res.np == 6
    np.testing.assert_allclose(res.lnL, -2749.029061, atol=1e-4)
